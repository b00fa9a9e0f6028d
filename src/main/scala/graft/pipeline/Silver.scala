package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Spatial
import graft.operators.Upsert

/** Silver-layer transforms reproducing the reference's query semantics on
  * Spark (each cites its source in /root/reference). All are pure
  * DataFrame→DataFrame functions over injected bronze inputs — no catalog
  * coupling, unit-testable, and at scale each is a declarative plan Catalyst
  * can push down / broadcast / reorder.
  *
  * Zone branches arrive as zoneLevel→DataFrame maps; the reference hardcodes
  * three UNION ALL branches per table (distrito/municipio/gau).
  */
object Silver {

  /** si/no (case-insensitive) → nullable boolean; anything else → null.
    * Reference: silver/mitma/mitma_od.py:47-56 (CASE WHEN x ILIKE 'si').
    */
  def siNoBoolean(c: Column): Column =
    when(lower(c) === "si", true).when(lower(c) === "no", false)

  /** Weekend flag semantics (SURVEY §2.8 F5): the reference's
    * `dayofweek(datetime) IN (6,7)` under DuckDB numbering (0=Sun..6=Sat)
    * literally matches only Saturday; the evident intent is Sat+Sun.
    *  - intent (default): Spark dayofweek ∈ {1=Sun, 7=Sat}
    *  - literal parity:   Saturday only (Spark dayofweek = 7)
    */
  def weekendFlag(datetime: Column, literalParity: Boolean = false): Column =
    if (literalParity) dayofweek(datetime) === 7
    else dayofweek(datetime).isin(1, 7)

  /** silver_od (silver/mitma/mitma_od.py:33-134): per-branch tag + typing +
    * si/no booleans, UNION ALL, weekend/holiday flags, critical-field null
    * filter. `holidays` must expose a `date` column (see `holidays()`).
    * The holiday membership check is a broadcast left-join flag, not a
    * filter — at 100 TB the fact side never shuffles for it.
    */
  def od(branches: Map[String, DataFrame], holidays: DataFrame,
         literalWeekendParity: Boolean = false): DataFrame = {
    val base = branches.map { case (zoneLevel, df) =>
      df.select(
        lit(zoneLevel).as("zone_level"),
        to_timestamp(concat(col("fecha").cast("string"),
          lpad(col("periodo").cast("string"), 2, "0")), "yyyyMMddHH").as("datetime"),
        col("origen").as("origin_id"),
        col("destino").as("destination_id"),
        col("viajes").cast("double").as("n_trips"),
        col("viajes_km").cast("double").as("km_trips"),
        col("distancia").as("distance"),
        col("actividad_origen").as("origin_activity"),
        col("actividad_destino").as("destination_activity"),
        col("residencia").as("residence"),
        col("renta").as("income"),
        col("edad").as("age"),
        col("sexo").as("sex"),
        siNoBoolean(col("estudio_destino_posible")).as("study_possible_destination"),
        siNoBoolean(col("estudio_origen_posible")).as("study_possible_origin"))
    }.reduce(_ unionByName _)
    val holidayDates = broadcast(holidays.select(col("date").cast("date").as("__holiday_date")).distinct())
    base
      .withColumn("is_weekend", weekendFlag(col("datetime"), literalWeekendParity))
      .join(holidayDates, to_date(col("datetime")) === col("__holiday_date"), "left")
      .withColumn("is_holiday", col("__holiday_date").isNotNull)
      .drop("__holiday_date")
      .na.drop(Seq("datetime", "origin_id", "destination_id", "n_trips", "km_trips", "distance"))
  }

  /** bronze_spanish_holidays (bronze/tasks/spanish_holidays.py:31-41):
    * nationwide filter + first element of the `name` list (1-based in
    * DuckDB → element_at(…, 1) here) → its `text` field.
    */
  def holidays(raw: DataFrame): DataFrame =
    raw.filter(col("nationwide") === true)
      .select(col("startDate").cast("date").as("date"),
        element_at(col("name"), 1).getField("text").as("name"))

  /** silver_zones (silver/mitma/mitma_zonification.py:35-73): WKT →
    * area-weighted centroid lon/lat per zone, null-filtered. The WKT string
    * is kept (the reference materializes geometry_obj; we keep the parseable
    * source of truth instead of a geometry type).
    */
  def zones(branches: Map[String, DataFrame]): DataFrame = {
    val base = branches.map { case (zoneLevel, df) =>
      df.select(
        col("ID").as("id"),
        col("Nombre").as("name"),
        lit(zoneLevel).as("zone_level"),
        col("geometry"))
    }.reduce(_ unionByName _)
    base
      .withColumn("__centroid", Spatial.wktCentroid(col("geometry")))
      .withColumn("centroid_longitude", col("__centroid.x"))
      .withColumn("centroid_latitude", col("__centroid.y"))
      .drop("__centroid")
      // centroid non-null too: a NON-null but unparseable WKT (e.g. the
      // reference's astype(str) turning None into the literal 'None')
      // yields a null centroid, and the reference's ST_GeomFromText path
      // could never emit such a zone — letting it through would surface as
      // null distance_km rows downstream
      .filter(col("id").isNotNull && col("name").isNotNull && col("geometry").isNotNull &&
        col("centroid_longitude").isNotNull && col("centroid_latitude").isNotNull)
  }

  /** silver_distances (silver/distances.py:28-39): all zone pairs within a
    * zone_level, great-circle km. The reference writes CROSS JOIN + WHERE;
    * we keep the equi-key join on zone_level so Catalyst hash-joins per
    * level and only the != residual is post-filtered — O(n²) output rows,
    * but never an unkeyed cross product. At scale, repartition on
    * zone_level before the join if levels are few and large.
    */
  def distances(zones: DataFrame): DataFrame = {
    val o = zones.select(col("zone_level"), col("id").as("origin"),
      col("centroid_longitude").as("o_lon"), col("centroid_latitude").as("o_lat"))
    val d = zones.select(col("zone_level"), col("id").as("destination"),
      col("centroid_longitude").as("d_lon"), col("centroid_latitude").as("d_lat"))
    o.join(d, Seq("zone_level"))
      .filter(col("origin") =!= col("destination"))
      .select(col("origin"), col("destination"),
        (Spatial.haversineMeters(col("o_lon"), col("o_lat"), col("d_lon"), col("d_lat")) / 1000.0)
          .as("distance_km"))
  }

  /** silver_overnight_stay (silver/mitma/mitma_overnights.py:31-62). */
  def overnights(branches: Map[String, DataFrame]): DataFrame =
    branches.map { case (zoneLevel, df) =>
      df.select(
        lit(zoneLevel).as("zone_level"),
        to_date(col("fecha").cast("string"), "yyyyMMdd").as("date"),
        col("zona_pernoctacion").as("overnight_zone"),
        col("zona_residencia").as("residence_zone"),
        col("personas").cast("double").as("people"))
    }.reduce(_ unionByName _)
      .na.drop(Seq("date", "overnight_zone", "residence_zone", "people"))

  /** silver_people_day (silver/mitma/mitma_people_day.py:32-80). */
  def peopleDay(branches: Map[String, DataFrame]): DataFrame =
    branches.map { case (zoneLevel, df) =>
      df.select(
        lit(zoneLevel).as("zone_level"),
        to_date(col("fecha").cast("string"), "yyyyMMdd").as("date"),
        col("zona_pernoctacion").as("overnight_zone"),
        col("edad").as("age"),
        col("sexo").as("sex"),
        col("numero_viajes").as("n_trips"),
        col("personas").cast("double").as("people"))
    }.reduce(_ unionByName _)
      .na.drop(Seq("date", "overnight_zone", "age", "sex", "n_trips", "people"))

  // --- INE chain (silver/ine/*.py) ------------------------------------------

  /** epoch-millis → date + 1 day (the reference's timezone fix, F7):
    * silver/ine/ine_empresas.py:22. Session must run UTC for parity.
    */
  private def epochMsPlusDay(c: Column): Column =
    date_add(to_date(timestamp_millis(c.cast("long"))), 1)

  /** Shared INE flattening: explode Data (with the len>0 guard explode
    * already implies), epoch fix, name/tipo parsing hooks.
    */
  private def ineFlat(src: DataFrame, nombre: Column, tipo: Column): DataFrame =
    src
      .filter(col("Data").isNotNull && size(col("Data")) > 0)
      .select(col("COD"), col("Nombre"), explode(col("Data")).as("data_item"))
      .select(
        col("COD"),
        epochMsPlusDay(col("data_item.Fecha")).as("fecha"),
        nombre.as("nombre"),
        tipo.as("tipo"),
        col("data_item.Valor").cast("double").as("valor"))

  /** Shared INE enrichment: case-insensitive municipio join (ILIKE → lower
    * equality, broadcast dim), relations join, null-or filter, DISTINCT ON
    * COD with a deterministic tiebreak (the reference omits ORDER BY —
    * nondeterministic; we order by all output columns, SURVEY §7.4 item 2).
    */
  private def ineEnrich(flat: DataFrame, municipios: DataFrame, relations: DataFrame,
                        extraFilter: Column = lit(true)): DataFrame = {
    val m = broadcast(municipios.select(col("Codigo"), col("Nombre").as("m_nombre")))
    val r = broadcast(relations.select(col("municipio_ine"), col("distrito_mitma"),
      col("municipio_mitma"), col("gau_mitma")))
    val joined = flat
      .join(m, lower(col("nombre")) === lower(col("m_nombre")), "left")
      .join(r, col("Codigo") === col("municipio_ine"), "left")
      .filter(extraFilter &&
        (col("distrito_mitma").isNotNull || col("municipio_mitma").isNotNull || col("gau_mitma").isNotNull))
      .select(col("Codigo").as("codigo_ine"), col("COD"), col("fecha"), col("nombre"),
        col("tipo"), col("valor"), col("distrito_mitma"), col("municipio_mitma"), col("gau_mitma"))
    Upsert.distinctOn(joined, Seq("COD"),
      joined.columns.filter(_ != "COD").map(c => col(c).asc).toSeq)
      .drop("COD") // reference: SELECT DISTINCT ON (COD) … * EXCLUDE (COD)
  }

  /** silver_business (silver/ine/ine_empresas.py:17-47): tipo = 4th name
    * segment, CNAE-only rows.
    */
  def business(empresas: DataFrame, municipios: DataFrame, relations: DataFrame): DataFrame = {
    val flat = ineFlat(empresas,
      nombre = coalesce(nullif(trim(split_part(col("Nombre"), lit("."), lit(1))), lit("")), col("Nombre")),
      tipo = trim(split_part(col("Nombre"), lit("."), lit(4))))
    ineEnrich(flat, municipios, relations, extraFilter = lower(col("tipo")).contains("cnae"))
  }

  /** silver_population (silver/ine/ine_poblacion.py:17-48): tipo = 2nd name
    * segment, no tipo filter.
    */
  def population(poblacion: DataFrame, municipios: DataFrame, relations: DataFrame): DataFrame = {
    val flat = ineFlat(poblacion,
      nombre = coalesce(nullif(trim(split_part(col("Nombre"), lit("."), lit(1))), lit("")), col("Nombre")),
      tipo = lower(trim(split_part(col("Nombre"), lit("."), lit(2)))))
    ineEnrich(flat, municipios, relations)
  }

  /** silver_income (silver/ine/ine_renta.py:17-56): distrito/sección rows
    * dropped, suffixes stripped from nombre, tipo = 3rd segment, valor
    * required.
    */
  def income(renta: DataFrame, municipios: DataFrame, relations: DataFrame): DataFrame = {
    val flat = renta
      .filter(!lower(col("Nombre")).rlike("(sección|seccion)\\s+\\d+") &&
        !lower(col("Nombre")).rlike("distrito\\s+\\d+"))
      .transform(src => ineFlat(src,
        nombre = trim(regexp_replace(split_part(col("Nombre"), lit("."), lit(1)),
          "(?i)\\s+(distrito|sección|seccion)\\s+\\d+", "")),
        tipo = lower(trim(split_part(col("Nombre"), lit("."), lit(3))))))
    ineEnrich(flat, municipios, relations, extraFilter = col("valor").isNotNull)
  }
}
