package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.pipeline.{Pipeline, Silver}
import java.sql.Date

case class IneItem(Fecha: Long, Valor: Double)
case class IneRow(COD: String, Nombre: String, Data: Seq[IneItem])
case class HolName(language: String, text: String)
case class HolRow(startDate: String, name: Seq[HolName], nationwide: Boolean)

/** Semantics tests for the reference-shaped silver transforms, on inline
  * fixtures exercising the FIXTURES.md corner cases.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  // --- fixtures -------------------------------------------------------------

  private def odBronze: DataFrame = Seq(
    // fecha, periodo, origen, destino, distancia, act_o, act_d, residencia, renta, edad, sexo, viajes, viajes_km, est_d, est_n
    ("20220305", "7", "A1", "B1", "0.5-2", "casa", "trabajo_estudio", "28", "10-15", "NA", "NA", "12.5", "20.1", "si", "no"),  // Saturday
    ("20220306", "23", "A1", "B2", "2-10", "casa", "frecuente", "28", "<10", "NA", "NA", "3.0", "9.9", "SI", "NO"),            // Sunday
    ("20220307", "0", "A2", "B1", "2-10", "casa", "no_frecuente", "08", ">15", "NA", "NA", "7.0", "14.0", "xx", ""),           // Monday, bad si/no
    ("20220308", "12", null, "B1", "2-10", "casa", "casa", "08", ">15", "NA", "NA", "1.0", "2.0", "si", "si"),                 // null origin → dropped
    ("20220308", "12", "A3", "B3", null, "casa", "casa", "08", ">15", "NA", "NA", "1.0", "2.0", "si", "si")                    // null distance → dropped
  ).toDF("fecha", "periodo", "origen", "destino", "distancia", "actividad_origen",
    "actividad_destino", "residencia", "renta", "edad", "sexo", "viajes", "viajes_km",
    "estudio_destino_posible", "estudio_origen_posible")

  private def holidaysRaw: DataFrame = Seq(
    HolRow("2022-03-07", Seq(HolName("ES", "Festivo Uno"), HolName("EN", "Holiday One")), nationwide = true),
    HolRow("2022-03-08", Seq(HolName("ES", "Regional")), nationwide = false)
  ).toDF()

  private def zonesBronze: DataFrame = Seq(
    ("Z1", "Zona Uno", "100", "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"),
    ("Z2", "Zona Dos", "200", "POLYGON((10 0, 12 0, 12 2, 10 2, 10 0))"),
    ("Z3", null, "0", "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))") // null name → dropped
  ).toDF("ID", "Nombre", "Poblacion", "geometry")

  private def municipios: DataFrame = Seq(
    ("46250", "València"), ("28079", "Madrid")).toDF("Codigo", "Nombre")

  private def relations: DataFrame = Seq(
    ("S1", "D1", "46250", "DM1", "MM1", "G1"),
    ("S2", "D2", "28079", "DM2", "MM2", null)
  ).toDF("seccion_ine", "distrito_ine", "municipio_ine", "distrito_mitma", "municipio_mitma", "gau_mitma")

  // 1672531200000 = 2023-01-01T00:00Z → fecha (after +1 day fix) = 2023-01-02
  private val jan23 = 1672531200000L

  // --- silver_od ------------------------------------------------------------

  test("silver_od: typing, flags, si/no booleans, null filter") {
    val got = Silver.od(Map("distrito" -> odBronze), Silver.holidays(holidaysRaw))
    val rows = got.orderBy("datetime").collect()
    assert(rows.length === 3) // two null-critical rows dropped

    val r0 = got.filter($"origin_id" === "A1" && $"destination_id" === "B1").head()
    assert(r0.getAs[java.sql.Timestamp]("datetime").toString === "2022-03-05 07:00:00.0")
    assert(r0.getAs[Double]("n_trips") === 12.5 && r0.getAs[Double]("km_trips") === 20.1)
    assert(r0.getAs[Boolean]("study_possible_destination") === true)
    assert(r0.getAs[Boolean]("study_possible_origin") === false)
    assert(r0.getAs[Boolean]("is_weekend") === true)   // Saturday
    assert(r0.getAs[Boolean]("is_holiday") === false)

    val sunday = got.filter($"destination_id" === "B2").head()
    assert(sunday.getAs[Boolean]("is_weekend") === true) // Sunday (intent semantics)

    val monday = got.filter($"origin_id" === "A2").head()
    assert(monday.getAs[Boolean]("is_weekend") === false)
    assert(monday.getAs[Boolean]("is_holiday") === true) // 2022-03-07 nationwide holiday
    assert(monday.isNullAt(monday.fieldIndex("study_possible_destination"))) // 'xx' → null
  }

  test("silver_od literal-parity weekend flag matches only Saturday") {
    val got = Silver.od(Map("distrito" -> odBronze), Silver.holidays(holidaysRaw),
      literalWeekendParity = true)
    val flags = got.select($"origin_id", $"destination_id", $"is_weekend")
      .as[(String, String, Boolean)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(flags(("A1", "B1")) === true)  // Saturday
    assert(flags(("A1", "B2")) === false) // Sunday not matched under literal DuckDB numbering
  }

  test("holidays: nationwide only, first name translation") {
    val got = Silver.holidays(holidaysRaw).as[(Date, String)].collect().toSeq
    assert(got === Seq((Date.valueOf("2022-03-07"), "Festivo Uno")))
  }

  // --- zones + distances ----------------------------------------------------

  test("silver_zones: centroids from WKT, null filter") {
    val got = Silver.zones(Map("distrito" -> zonesBronze))
    assert(got.count() === 2)
    val z1 = got.filter($"id" === "Z1").head()
    assert(z1.getAs[Double]("centroid_longitude") === 1.0)
    assert(z1.getAs[Double]("centroid_latitude") === 1.0)
  }

  test("silver_zones: non-null but unparseable WKT is dropped (no null-centroid zones)") {
    val withGarbage = zonesBronze.unionByName(
      Seq(("Z9", "Garbage", "7", "None")).toDF("ID", "Nombre", "Poblacion", "geometry"))
    val got = Silver.zones(Map("distrito" -> withGarbage))
    assert(got.filter($"id" === "Z9").count() === 0)
    assert(got.filter($"centroid_longitude".isNull || $"centroid_latitude".isNull).count() === 0)
  }

  test("silver_distances: symmetric pairs within zone_level, plausible km") {
    val zones = Silver.zones(Map("distrito" -> zonesBronze))
    val got = Silver.distances(zones)
    val rows = got.as[(String, String, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(rows.map(r => (r._1, r._2)) === Seq(("Z1", "Z2"), ("Z2", "Z1")))
    assert(rows.head._3 === rows(1)._3)
    // 10° of longitude at latitude 1° ≈ 1111.7 km
    assert(math.abs(rows.head._3 - 1111.7) < 5.0)
  }

  // --- INE chain ------------------------------------------------------------

  test("silver_business: explode, epoch+1day, CNAE filter, ILIKE join, distinct-on") {
    // tipo = 4th dot-segment (ine_empresas.py:24); CNAE must appear there
    val empresas = Seq(
      IneRow("E1", "València. Total. Empresas. Total CNAE.", Seq(IneItem(jan23, 100.0), IneItem(jan23, 110.0))),
      IneRow("E2", "Madrid. Total. Empresas. Industria.", Seq(IneItem(jan23, 50.0))),  // tipo has no CNAE → dropped
      IneRow("E3", "Nowhere. Total. Empresas. Total CNAE.", Seq(IneItem(jan23, 1.0))), // no municipio match → relations null → dropped
      IneRow("E4", "València. X. Y. Total CNAE.", Seq())                               // empty Data → dropped
    ).toDF()
    val got = Silver.business(empresas, municipios, relations)
    val rows = got.collect()
    assert(rows.length === 1) // E1 deduped to one row by DISTINCT ON (COD); E2/E3/E4 filtered
    val r = rows.head
    assert(r.getAs[String]("codigo_ine") === "46250")
    assert(r.getAs[String]("nombre") === "València")
    assert(r.getAs[String]("tipo") === "Total CNAE")
    assert(r.getAs[Date]("fecha") === Date.valueOf("2023-01-02"))
    assert(r.getAs[Double]("valor") === 100.0) // tiebreak: lowest valor wins deterministically
    assert(r.getAs[String]("gau_mitma") === "G1")
  }

  test("silver_population: 2nd segment tipo, empty-first-segment fallback") {
    val poblacion = Seq(
      IneRow("P1", "València. Total. Población.", Seq(IneItem(jan23, 800000.0))),
      IneRow("P2", ". Hombres. Población.", Seq(IneItem(jan23, 1.0))) // empty 1st segment → falls back to full Nombre, joins nothing → dropped
    ).toDF()
    val got = Silver.population(poblacion, municipios, relations)
    val rows = got.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("tipo") === "total")
    assert(rows.head.getAs[String]("codigo_ine") === "46250")
  }

  test("silver_income: distrito/sección rows dropped, suffix stripped, valor required") {
    val renta = Seq(
      IneRow("R1", "Madrid. Total. Renta neta media por persona.", Seq(IneItem(jan23, 15000.0))),
      IneRow("R2", "Madrid distrito 01. Total. Renta neta media por persona.", Seq(IneItem(jan23, 1.0))), // pre-filtered
      IneRow("R3", "Madrid sección 0101. Total. Renta neta media por persona.", Seq(IneItem(jan23, 1.0))) // pre-filtered
    ).toDF()
    val got = Silver.income(renta, municipios, relations)
    val rows = got.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("nombre") === "Madrid")
    // tipo = 3rd dot-segment, lowered (ine_renta.py:30)
    assert(rows.head.getAs[String]("tipo") === "renta neta media por persona")
    assert(rows.head.getAs[String]("codigo_ine") === "28079")
  }

  // --- end-to-end runner ----------------------------------------------------

  test("Pipeline.run materializes all silver tables with expected counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val overnight = Seq(("20220305", "Z1", "Z2", "40.0"))
      .toDF("fecha", "zona_residencia", "zona_pernoctacion", "personas")
    val peopleDay = Seq(("20220305", "Z1", "0-25", "M", "2", "10.0"))
      .toDF("fecha", "zona_pernoctacion", "edad", "sexo", "numero_viajes", "personas")
    val empresas = Seq(IneRow("E1", "València. Total. Empresas. Total CNAE.", Seq(IneItem(jan23, 100.0)))).toDF()
    val poblacion = Seq(IneRow("P1", "València. Total. Población.", Seq(IneItem(jan23, 800000.0)))).toDF()
    val renta = Seq(IneRow("R1", "Madrid. Total. Renta.", Seq(IneItem(jan23, 15000.0)))).toDF()
    val counts = Pipeline.run(spark, Pipeline.Inputs(
      odBranches = Map("distrito" -> odBronze),
      overnightBranches = Map("distrito" -> overnight),
      peopleDayBranches = Map("distrito" -> peopleDay),
      zoneBranches = Map("distrito" -> zonesBronze),
      holidaysRaw = holidaysRaw,
      empresas = empresas, poblacion = poblacion, renta = renta,
      municipios = municipios, relations = relations), dir)
    assert(counts === Map(
      "bronze_spanish_holidays" -> 1L, "silver_zones" -> 2L, "silver_distances" -> 2L,
      "silver_od" -> 3L, "silver_overnight_stay" -> 1L, "silver_people_day" -> 1L,
      "silver_business" -> 1L, "silver_population" -> 1L, "silver_income" -> 1L))
    // ad-hoc SQL surface over the registered views (SURVEY §3.3)
    assert(spark.sql("SELECT count(*) FROM silver_od WHERE is_weekend").as[Long].head() === 2L)

    // metastore mode: the nine tables land in the catalog like the
    // reference's DuckLake-backed silver schema
    val counts2 = Pipeline.run(spark, Pipeline.Inputs(
      odBranches = Map("distrito" -> odBronze),
      overnightBranches = Map("distrito" -> overnight),
      peopleDayBranches = Map("distrito" -> peopleDay),
      zoneBranches = Map("distrito" -> zonesBronze),
      holidaysRaw = holidaysRaw,
      empresas = empresas, poblacion = poblacion, renta = renta,
      municipios = municipios, relations = relations), dir, asTables = true)
    assert(counts2 === counts)
    val catalogNames = spark.catalog.listTables()
      .collect().filter(_.tableType == "MANAGED").map(_.name).toSet
    assert(counts.keySet.subsetOf(catalogNames), s"missing from catalog: ${counts.keySet -- catalogNames}")
    // partitioned managed fact table still prunes on the partition key
    assert(spark.table("silver_od").count() === 3L)
  }

  test("writeBucketed: same-bucketed tables equi-join with no shuffle on either side") {
    import org.apache.spark.sql.functions._
    val facts = spark.range(1000).select(
      (col("id") % 100).as("k"), (col("id") * 2).as("v"))
    val dims = spark.range(100).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    graft.sources.Tables.writeBucketed(facts, "bkt_facts", Seq("k"), nBuckets = 8)
    graft.sources.Tables.writeBucketed(dims, "bkt_dims", Seq("k"), nBuckets = 8)
    // force the sort-merge path (broadcast would mask the co-location)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false") // plan string sans AQE wrappers
      val joined = spark.table("bkt_facts").join(spark.table("bkt_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must read bucket i vs bucket i, no shuffle:\n${plan.take(1500)}")
      assert(joined.count() === 1000L)
      // the same join WITHOUT bucketing shuffles both sides — the control
      val plainPlan = facts.join(dims, "k").queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"), "control: unbucketed join should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
