package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.sources.Tables

/** Bronze source schemas (all-VARCHAR schema-on-read, the reference's
  * `all_varchar=true` convention — /root/reference/airflow/dags/bronze/
  * utils.py:328; authoritative column lists from docs/dag_bronze_mitma.py).
  */
object Schemas {
  private def allString(cols: String*): StructType =
    StructType(cols.map(StructField(_, StringType, nullable = true)))

  /** MITMA OD trips (docs/dag_bronze_mitma.py:87-105). */
  val mitmaOd: StructType = allString(
    "fecha", "periodo", "origen", "destino", "distancia",
    "actividad_origen", "actividad_destino", "residencia", "renta",
    "edad", "sexo", "viajes", "viajes_km",
    "estudio_destino_posible", "estudio_origen_posible")

  /** MITMA overnight stays (docs/dag_bronze_mitma.py:207-216). */
  val mitmaOvernight: StructType = allString(
    "fecha", "zona_residencia", "zona_pernoctacion", "personas")

  /** MITMA people-per-day (docs/dag_bronze_mitma.py:302-313). */
  val mitmaPeopleDay: StructType = allString(
    "fecha", "zona_pernoctacion", "edad", "sexo", "numero_viajes", "personas")

  /** MITMA zonification (bronze/utils.py:679-694). */
  val mitmaZones: StructType = allString("ID", "Nombre", "Poblacion", "geometry")

  /** MITMA↔INE relations (docs/dag_bronze_other.py:42-52). */
  val mitmaIneRelations: StructType = allString(
    "seccion_ine", "distrito_ine", "municipio_ine",
    "distrito_mitma", "municipio_mitma", "gau_mitma")
}

/** Orchestrator mirroring the reference DAG's silver dependency wiring
  * (/root/reference/airflow/dags/main.py:159-182): zonification→distances,
  * holidays→od, municipios+relations→INE tables. One SparkSession, one job
  * per table; each result is registered as a temp view (the reference's
  * ad-hoc SQL surface, SURVEY §3.3) and optionally persisted.
  */
object Pipeline {

  /** All bronze inputs, already loaded (from Tables.pipeCsv/jsonArray or
    * test fixtures). Branch maps are zone_level → DataFrame.
    */
  case class Inputs(
      odBranches: Map[String, DataFrame],
      overnightBranches: Map[String, DataFrame],
      peopleDayBranches: Map[String, DataFrame],
      zoneBranches: Map[String, DataFrame],
      holidaysRaw: DataFrame,
      empresas: DataFrame,
      poblacion: DataFrame,
      renta: DataFrame,
      municipios: DataFrame,
      relations: DataFrame)

  /** Build every silver table in dependency order. Returns table→DataFrame
    * (lazy plans; nothing is executed until an action).
    */
  def buildSilver(in: Inputs): Map[String, DataFrame] = {
    val holidays = Silver.holidays(in.holidaysRaw)
    val zones = Silver.zones(in.zoneBranches)
    Map(
      "bronze_spanish_holidays" -> holidays,
      "silver_zones" -> zones,
      "silver_distances" -> Silver.distances(zones),
      "silver_od" -> Silver.od(in.odBranches, holidays),
      "silver_overnight_stay" -> Silver.overnights(in.overnightBranches),
      "silver_people_day" -> Silver.peopleDay(in.peopleDayBranches),
      "silver_business" -> Silver.business(in.empresas, in.municipios, in.relations),
      "silver_population" -> Silver.population(in.poblacion, in.municipios, in.relations),
      "silver_income" -> Silver.income(in.renta, in.municipios, in.relations))
  }

  /** Materialize all silver tables. The big fact table (silver_od) is
    * partitioned by zone_level — the reference's query access pattern
    * always pins a zone level.
    *
    * Two persistence modes, mirroring the reference's DuckLake catalog
    * (bronze/utils.py:146-153 keeps silver tables in a Postgres-backed
    * catalog, not loose files):
    *   - `asTables = false`: parquet dirs under `warehouseDir` + temp views
    *     (session-scoped, the test default);
    *   - `asTables = true`: metastore-managed tables via `saveAsTable`
    *     (overwrite ≙ CREATE OR REPLACE TABLE) — survives the session and
    *     lets any catalog-aware client query the nine tables by name.
    */
  def run(spark: SparkSession, in: Inputs, warehouseDir: String,
          asTables: Boolean = false): Map[String, Long] =
    buildSilver(in).map { case (name, df) =>
      val parts = if (name == "silver_od") Seq("zone_level") else Nil
      val back = if (asTables) {
        val w = df.write.mode("overwrite").format("parquet")
        (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).saveAsTable(name)
        // a same-named temp view (e.g. from an earlier dir-mode run) would
        // shadow the managed table in spark.table — the catalog table must
        // be the referent after this mode, like CREATE OR REPLACE TABLE
        spark.catalog.dropTempView(name)
        spark.table(name)
      } else {
        Tables.overwrite(df, s"$warehouseDir/$name", parts)
        val b = spark.read.parquet(s"$warehouseDir/$name")
        b.createOrReplaceTempView(name)
        b
      }
      name -> back.count()
    }
}
