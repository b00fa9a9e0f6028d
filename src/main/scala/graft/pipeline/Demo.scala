package graft.pipeline

import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GraftSession
import graft.sources.Tables
import graft.operators.Upsert

/** End-to-end, file-based run of the reference pipeline shape
  * (SURVEY §3.1): generate reference-shaped sources (gzipped pipe-CSV days,
  * JSON-array INE/holidays), ingest bronze with the idempotent MERGE kernels
  * — re-loading day 1 alongside day 2 exactly as the reference's
  * re-triggered Airflow runs do — then build and materialize every silver
  * table. `main` prints the per-table counts.
  */
object Demo {

  private def writeGz(p: Path, content: String): String = {
    val out = new GZIPOutputStream(Files.newOutputStream(p))
    out.write(content.getBytes("UTF-8")); out.close(); p.toString
  }

  private val odHeader = "fecha|periodo|origen|destino|distancia|actividad_origen|" +
    "actividad_destino|residencia|renta|edad|sexo|viajes|viajes_km|" +
    "estudio_destino_posible|estudio_origen_posible"

  private def odDay(fecha: String, zones: Seq[String]): String =
    (odHeader +: (for {
      (o, i) <- zones.zipWithIndex
      d <- zones if d != o
      h <- Seq(7, 18)
    } yield s"$fecha|$h|$o|$d|0.5-2|casa|trabajo_estudio|28|10-15|NA|NA|${i + 1}.5|${(i + 1) * 2}.0|si|no"))
      .mkString("\n")

  /** Generate all sources under `dir`, run bronze + silver, return counts. */
  def run(spark: SparkSession, dir: Path): Map[String, Long] = {
    val src = Files.createDirectories(dir.resolve("src"))
    val wh = dir.resolve("warehouse").toString

    // --- source files ------------------------------------------------------
    val zoneIds = Map(
      "distrito" -> Seq("D01", "D02", "D03"),
      "municipio" -> Seq("M01", "M02"),
      "gau" -> Seq("G01", "G02"))
    val odFiles: Map[String, Seq[String]] = zoneIds.map { case (lvl, zs) =>
      lvl -> Seq(
        writeGz(src.resolve(s"od_${lvl}_20220305.csv.gz"), odDay("20220305", zs)),
        writeGz(src.resolve(s"od_${lvl}_20220306.csv.gz"), odDay("20220306", zs)))
    }
    val zoneFiles = zoneIds.map { case (lvl, zs) =>
      val rows = zs.zipWithIndex.map { case (z, i) =>
        s"$z|Zona $z|${100 * (i + 1)}|POLYGON((${i} 0, ${i + 2} 0, ${i + 2} 2, ${i} 2, ${i} 0))"
      }
      lvl -> Files.writeString(src.resolve(s"zones_$lvl.csv"),
        ("ID|Nombre|Poblacion|geometry" +: rows).mkString("\n")).toString
    }
    val holidaysJson = Files.writeString(src.resolve("holidays.json"),
      """[{"startDate": "2022-03-06", "name": [{"language": "ES", "text": "Festivo"}], "nationwide": true},
        | {"startDate": "2022-03-07", "name": [{"language": "ES", "text": "Local"}], "nationwide": false}]""".stripMargin).toString
    def ineJson(name: String, nombre: String): String = Files.writeString(src.resolve(name),
      s"""[{"COD": "C1", "Nombre": "$nombre", "Data": [{"Fecha": 1672531200000, "Valor": 42.0}]}]""").toString
    val empresas = ineJson("empresas.json", "Zona D01. Total. Empresas. Total CNAE.")
    val poblacion = ineJson("poblacion.json", "Zona D01. Total. Población.")
    val renta = ineJson("renta.json", "Zona D01. Total. Renta neta.")
    val municipiosJson = Files.writeString(src.resolve("municipios.json"),
      """[{"Id": 1, "Codigo": "46250", "Nombre": "Zona D01"}]""").toString
    val relationsCsv = Files.writeString(src.resolve("relations.csv"),
      ("seccion_ine|distrito_ine|municipio_ine|distrito_mitma|municipio_mitma|gau_mitma" +
        "\nS1|D1|46250|D01|M01|G01")).toString

    // --- bronze: incremental MERGE loads (S1 + S9), day 2 re-ships day 1 ---
    val odBronze = odFiles.map { case (lvl, files) =>
      val day1 = Tables.pipeCsv(spark, Seq(files.head), Some(Schemas.mitmaOd))
      // second run delivers BOTH days (reference re-runs are idempotent)
      val day12 = Tables.pipeCsv(spark, files, Some(Schemas.mitmaOd))
      lvl -> Upsert.allColumnsUpsert(day1, day12)
    }
    val zoneBronze = zoneFiles.map { case (lvl, f) =>
      lvl -> Tables.pipeCsv(spark, Seq(f), Some(Schemas.mitmaZones))
    }
    val ine = Map(
      "empresas" -> Tables.jsonArray(spark, Seq(empresas)),
      "poblacion" -> Tables.jsonArray(spark, Seq(poblacion)),
      "renta" -> Tables.jsonArray(spark, Seq(renta)))
      .map { case (k, df) => k -> Upsert.keyedUpsert(df, df, Seq("COD")) } // idempotent keyed MERGE (S10)

    // --- silver ------------------------------------------------------------
    Pipeline.run(spark, Pipeline.Inputs(
      odBranches = odBronze,
      overnightBranches = Map("distrito" -> demoOvernights(spark)),
      peopleDayBranches = Map("distrito" -> demoPeopleDay(spark)),
      zoneBranches = zoneBronze,
      holidaysRaw = Tables.jsonArray(spark, Seq(holidaysJson)),
      empresas = ine("empresas"), poblacion = ine("poblacion"), renta = ine("renta"),
      municipios = Tables.jsonArray(spark, Seq(municipiosJson)),
      relations = Tables.pipeCsv(spark, Seq(relationsCsv), Some(Schemas.mitmaIneRelations))), wh)
  }

  private def demoOvernights(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("20220305", "D01", "D02", "40.0"), ("20220306", "D02", "D01", "25.0"))
      .toDF("fecha", "zona_residencia", "zona_pernoctacion", "personas")
  }

  private def demoPeopleDay(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("20220305", "D01", "0-25", "M", "2", "10.0"))
      .toDF("fecha", "zona_pernoctacion", "edad", "sexo", "numero_viajes", "personas")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val counts = run(spark, Files.createTempDirectory("graft_demo"))
    counts.toSeq.sortBy(_._1).foreach { case (t, n) => println(f"$t%-28s $n%6d rows") }
    spark.stop()
  }
}
