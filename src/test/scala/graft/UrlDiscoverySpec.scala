package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.UrlDiscovery

class UrlDiscoverySpec extends AnyFunSuite {
  private val base = "https://example.test/estudios_basicos"
  private def odUrl(d: String) =
    s"$base/por-distritos/viajes/ficheros-diarios/${d.take(4)}-${d.slice(4, 6)}/${d}_Viajes_distritos.csv.gz"

  private val rss =
    s"""<rss><item><link>${odUrl("20220305")}</link></item>
       |<item><link>${odUrl("20220306")}</link></item>
       |<item><link>${odUrl("20220306")}</link></item>  <!-- duplicate entry -->
       |<item><link>${odUrl("20220310")}</link></item>
       |<item><link>$base/por-municipios/viajes/ficheros-diarios/2022-03/20220305_Viajes_municipios.csv.gz</link></item>
       |<item><link>$base/por-GAU/viajes/ficheros-diarios/2022-03/20220305_Viajes_GAU.csv.gz</link></item>
       |<item><link>$base/por-distritos/pernoctaciones/ficheros-diarios/2022-03/20220305_Pernoctaciones_distritos.csv.gz</link></item>
       |""".stripMargin

  test("filters by dataset+zone, dedups, date range inclusive, sorted ascending") {
    val got = UrlDiscovery.mitmaUrls(rss, "od", "distritos",
      LocalDate.parse("2022-03-05"), LocalDate.parse("2022-03-06"))
    assert(got === Seq(odUrl("20220305"), odUrl("20220306")))
  }

  test("gau zone matches case-insensitively (por-GAU paths)") {
    val got = UrlDiscovery.mitmaUrls(rss, "od", "gau",
      LocalDate.parse("2022-03-01"), LocalDate.parse("2022-03-31"))
    assert(got.size === 1 && got.head.contains("Viajes_GAU"))
  }

  test("other datasets select their own prefix; invalid args rejected") {
    val p = UrlDiscovery.mitmaUrls(rss, "overnight_stay", "distritos",
      LocalDate.parse("2022-03-01"), LocalDate.parse("2022-03-31"))
    assert(p.size === 1 && p.head.contains("Pernoctaciones"))
    intercept[IllegalArgumentException](
      UrlDiscovery.mitmaUrls(rss, "od", "bad_zone", LocalDate.now(), LocalDate.now()))
    intercept[IllegalArgumentException](
      UrlDiscovery.mitmaUrls(rss, "bad", "gau", LocalDate.now(), LocalDate.now()))
  }
}
