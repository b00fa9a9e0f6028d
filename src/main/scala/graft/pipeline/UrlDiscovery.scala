package graft.pipeline

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Pure URL-discovery logic matching the reference's RSS scraping semantics
  * (/root/reference/airflow/dags/bronze/utils.py:226-295): regex over the
  * feed text, case-insensitive, de-duplicated, date-range filtered
  * (inclusive both ends), sorted ascending by file date. Network fetching is
  * the caller's concern (driver-side, SURVEY §2.1 S5/S6) — this is the
  * testable parsing core.
  */
object UrlDiscovery {

  /** dataset → (url path segment, file prefix) (utils.py:242-246). */
  private val datasetMap = Map(
    "od" -> ("viajes", "Viajes"),
    "people_day" -> ("personas", "Personas_dia"),
    "overnight_stay" -> ("pernoctaciones", "Pernoctaciones"))

  private val day = DateTimeFormatter.ofPattern("yyyyMMdd")

  def mitmaUrls(rssText: String, dataset: String, zoneType: String,
                startDate: LocalDate, endDate: LocalDate): Seq[String] = {
    require(Seq("distritos", "municipios", "gau").contains(zoneType),
      s"Invalid zone_type: $zoneType")
    val (path, prefix) = datasetMap.getOrElse(dataset,
      throw new IllegalArgumentException(s"Invalid dataset: $dataset"))
    val zoneSuffix = if (zoneType == "gau") "GAU" else zoneType
    val pattern =
      (s"""(?i)(https?://[^\\s"<>]*/estudios_basicos/por-$zoneType/$path/""" +
        s"""ficheros-diarios/\\d{4}-\\d{2}/(\\d{8})_${prefix}_$zoneSuffix\\.csv\\.gz)""").r
    pattern.findAllMatchIn(rssText)
      .map(m => (m.group(1), m.group(2)))
      .toSeq.distinct
      .flatMap { case (url, d) =>
        // a malformed 8-digit run (e.g. '20231399' from a typo'd feed
        // entry) skips THAT url; it must not abort discovery for the feed
        scala.util.Try(LocalDate.parse(d, day)).toOption
          .filter(fd => !fd.isBefore(startDate) && !fd.isAfter(endDate))
          .map(_ => (url, d))
      }
      .sortBy(_._2)
      .map(_._1)
  }
}
