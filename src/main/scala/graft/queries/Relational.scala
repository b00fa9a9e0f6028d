package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Upsert
import graft.functions.Spatial

/** Relational query catalog covering SURVEY §2's operator inventory on the
  * driver's TPC-H-ish fixtures. Each entry has a DuckDB-runnable oracle in
  * `oracle` with IDENTICAL output column names and value rounding.
  *
  * Cross-engine parity rules used throughout (SURVEY §7.4):
  *  - every derived integer is cast to long (DuckDB derives BIGINT);
  *  - sums/avgs of doubles are rounded (both engines round half-away-from-
  *    zero for positives);
  *  - DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  *    replace-all; DuckDB `dayofweek` is 0=Sun..6=Sat vs Spark 1..7.
  */
object Relational {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-family aggregation (TPC-H Q1 shape): filter → groupBy → 5 aggs.
    // Filter + projection push down to the parquet scan; partial aggregation
    // is map-side combined before the single shuffle on the group keys.
    "q01_agg" -> ((s, d) => {
      T(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // quantity is integer-valued: a double sum is exact below 2^53
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          // money sums in EXACT decimal cents, double only at the very end
          // (round-10 scale rule): a direct double sum is partition-order
          // dependent and its random-walk drift crosses the cent at the
          // 100× fixture's ~4e11 magnitudes (measured r13 — 3 of 6 groups
          // off by 0.01). The decimal sum is order-independent. The final
          // decimal→double conversions CAN differ by 1 ulp between engines
          // (Spark's BigDecimal.doubleValue is correctly rounded; DuckDB's
          // int128→double then /10^scale may double-round — latent at
          // ~4e11 where round(6) is a no-op), so diffcheck's compare
          // carries a 2e-15 relative tolerance on float columns: ~4.5 ulps,
          // a decade below a cent error at these magnitudes.
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
            .cast("double").as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // P1/P4/F4: projection + rename + range/null predicates (pushed to scan).
    "q02_project_filter" -> ((s, d) => {
      T(s, d, "lineitem")
        .filter(col("l_quantity").isNotNull &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select(
          col("l_orderkey").as("order_id"),
          col("l_linenumber").cast("long").as("line_no"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"),
          upper(col("l_returnflag")).as("flag"))
    }),

    // J1: left equi-joins through the dimension chain; nation/region are
    // broadcast (small dims) so the only shuffle is the final aggregation.
    "q03_join_left" -> ((s, d) => {
      val c = T(s, d, "customer")
      val n = broadcast(T(s, d, "nation"))
      val r = broadcast(T(s, d, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"), "left")
        .join(r, n("n_regionkey") === r("r_regionkey"), "left")
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("total_bal"))
    }),

    // J2: case-insensitive (ILIKE-style) left join, rewritten to a
    // lower()=lower() equi-join → hash/broadcast joinable.
    "q04_join_ilike" -> ((s, d) => {
      val a = T(s, d, "nation")
      val b = T(s, d, "nation")
        .select(upper(col("n_name")).as("name_uc"), col("n_regionkey").as("dim_regionkey"))
      a.join(broadcast(b), lower(a("n_name")) === lower(b("name_uc")), "left")
        .select(a("n_nationkey"), a("n_name"), b("dim_regionkey"))
    }),

    // J4: IN-subquery used as a FLAG (not a filter) — left join on the
    // broadcast key set + isNotNull, exactly the reference's is_holiday shape
    // (/root/reference/airflow/dags/silver/mitma/mitma_od.py:116-117).
    "q05_flag_semi" -> ((s, d) => {
      val rich = T(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("rich_key")).distinct()
      T(s, d, "orders")
        .join(broadcast(rich), col("o_custkey") === col("rich_key"), "left")
        .withColumn("is_rich_cust", col("rich_key").isNotNull)
        .groupBy(col("o_orderstatus"), col("is_rich_cust"))
        .agg(count(lit(1)).as("n_orders"),
          // exact decimal cents (see q01_agg) — the double sum drifted past
          // the cent at 100× magnitudes
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // J3: self-join with equi-key (region) + != residual — the reference's
    // distance-matrix shape (silver/distances.py:33-36). Never a crossJoin:
    // Catalyst hash-joins on the equi-key.
    "q06_cross_theta" -> ((s, d) => {
      val n1 = T(s, d, "nation").select(col("n_regionkey").as("rk"), col("n_nationkey").as("id_a"))
      val n2 = T(s, d, "nation").select(col("n_regionkey").as("rk"), col("n_nationkey").as("id_b"))
      n1.join(n2, Seq("rk")).filter(col("id_a") =!= col("id_b"))
    }),

    // U1 + P3: per-branch literal tags, UNION ALL, aggregate.
    "q08_union_tag" -> ((s, d) => {
      val o = T(s, d, "orders")
      val open = o.filter(col("o_orderstatus") === "O").withColumn("bucket", lit("open"))
      val fin = o.filter(col("o_orderstatus") === "F").withColumn("bucket", lit("finished"))
      val other = o.filter(!col("o_orderstatus").isin("O", "F")).withColumn("bucket", lit("other"))
      open.unionByName(fin).unionByName(other)
        .groupBy(col("bucket"), year(col("o_orderdate")).cast("long").as("yr"))
        .agg(count(lit(1)).as("n"))
    }),

    // F3/F8/F9/F10/F11/F18: scalar string functions.
    "q09_scalar_string" -> ((s, d) => {
      T(s, d, "part").select(
        col("p_partkey"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
        concat(col("p_brand"), lit("#"), lpad(col("p_size").cast("string"), 3, "0")).as("brand_code"),
        lower(trim(col("p_type"))).as("type_norm"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("consonants"),
        coalesce(nullif(split_part(col("p_name"), lit(" "), lit(3)), lit("")), lit("none")).as("third_word"),
        col("p_size").cast("double").as("size_d"),
        length(col("p_name")).cast("long").as("name_len"))
    }),

    // P5/P6 CASE classifier + F5/F6/F7 date functions.
    "q10_case_date" -> ((s, d) => {
      T(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
          .when(col("o_orderpriority") === "3-MEDIUM", "medium")
          .otherwise("low").as("prio_class"),
        to_date(col("o_orderdate")).as("order_date"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        dayofweek(col("o_orderdate")).isin(1, 7).as("is_weekend"),
        date_add(to_date(col("o_orderdate")), 1).as("next_day"))
    }),

    // J5/F15/F17: explode (lateral unnest) + re-aggregate.
    "q11_explode_tokens" -> ((s, d) => {
      T(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
    }),

    // S10/J6: keyed MERGE upsert — source wins on key, target survives
    // unmatched. Emulated with left_anti + union (Upsert.keyedUpsert).
    "q12_upsert" -> ((s, d) => {
      val o = T(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val target = o.filter(col("o_orderkey") % 3 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") * 0.9)
      val source = o.filter(col("o_orderkey") % 2 === 0)
      Upsert.keyedUpsert(target, source, Seq("o_orderkey"))
    }),

    // G4 + J3: pairwise haversine distance matrix over synthetic centroids,
    // equi-keyed on region — the silver_distances shape.
    "q13_haversine" -> ((s, d) => {
      val pts = T(s, d, "nation").select(
        col("n_nationkey").as("id"), col("n_regionkey").as("rk"),
        ((col("n_nationkey") * 37 % 360) - 180 + lit(0.5)).cast("double").as("lon"),
        ((col("n_nationkey") * 17 % 180) - 90 + lit(0.5)).cast("double").as("lat"))
      val a = pts.select(col("rk"), col("id").as("id_a"), col("lon").as("lon_a"), col("lat").as("lat_a"))
      val b = pts.select(col("rk"), col("id").as("id_b"), col("lon").as("lon_b"), col("lat").as("lat_b"))
      a.join(b, Seq("rk")).filter(col("id_a") < col("id_b"))
        .select(col("rk"), col("id_a"), col("id_b"),
          round(Spatial.haversineMeters(col("lon_a"), col("lat_a"), col("lon_b"), col("lat_b")) / 1000.0, 3).as("dist_km"))
    }),

    // Window top-k per group (A2 generalization): single shuffle on the
    // partition key, rank streamed within partitions.
    "q14_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      T(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),

    // O1/O2: global sort + limit (Spark does a TakeOrdered — no full sort).
    "q15_sort_limit" -> ((s, d) => {
      T(s, d, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(10)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("line_no"), col("l_extendedprice"))
    }),

    // A3: DISTINCT projection.
    "q16_distinct" -> ((s, d) =>
      T(s, d, "customer").select(col("c_mktsegment"), col("c_nationkey")).distinct()),

    // min/max scalar aggregates per group.
    "q17_minmax" -> ((s, d) => {
      T(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"),
          min(col("l_shipdate")).as("first_ship"), max(col("l_shipdate")).as("last_ship"),
          countDistinct(col("l_suppkey")).as("n_supp"))
    }),

    // SURVEY §2.7 set operations: INTERSECT / EXCEPT / UNION-distinct
    // (Spark's intersect/except/union+distinct — all shuffle once on the
    // full row as key, the same hash-agg shape as DISTINCT, so they scale
    // like any keyed aggregate). One tagged result exercises all three.
    "q46_set_ops" -> ((s, d) => {
      val o = T(s, d, "orders")
      def buyers(yr: Int) =
        o.filter(year(col("o_orderdate")) === yr).select(col("o_custkey"))
      val a = buyers(1995)
      val b = buyers(1996)
      a.intersect(b).withColumn("op", lit("both"))
        .unionByName(a.except(b).withColumn("op", lit("only_1995")))
        .unionByName(b.except(a).withColumn("op", lit("only_1996")))
        .unionByName(a.union(b).distinct().withColumn("op", lit("either")))
    }))

  val oracle: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        | sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
        | sum(l_extendedprice::DECIMAL(18,2)
        |     * (1.00::DECIMAL(3,2) - l_discount::DECIMAL(3,2)))::DOUBLE AS sum_disc_price,
        | round(avg(l_discount),6) AS avg_disc, count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_project_filter" ->
      """SELECT l_orderkey AS order_id, l_linenumber::BIGINT AS line_no,
        | l_extendedprice*(1-l_discount)*(1+l_tax) AS charge,
        | upper(l_returnflag) AS flag
        |FROM lineitem
        |WHERE l_quantity IS NOT NULL AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_join_left" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal),2) AS total_bal
        |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q04_join_ilike" ->
      """SELECT a.n_nationkey, a.n_name, b.dim_regionkey
        |FROM nation a LEFT JOIN
        | (SELECT upper(n_name) AS name_uc, n_regionkey AS dim_regionkey FROM nation) b
        | ON lower(a.n_name) = lower(b.name_uc)""".stripMargin,
    "q05_flag_semi" ->
      """SELECT o_orderstatus,
        | o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) AS is_rich_cust,
        | count(*) AS n_orders, sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q06_cross_theta" ->
      """SELECT a.n_regionkey AS rk, a.n_nationkey AS id_a, b.n_nationkey AS id_b
        |FROM nation a JOIN nation b
        | ON a.n_regionkey = b.n_regionkey AND a.n_nationkey != b.n_nationkey""".stripMargin,
    "q08_union_tag" ->
      """SELECT bucket, yr, count(*) AS n FROM (
        | SELECT 'open' AS bucket, EXTRACT(YEAR FROM o_orderdate)::BIGINT AS yr FROM orders WHERE o_orderstatus = 'O'
        | UNION ALL
        | SELECT 'finished', EXTRACT(YEAR FROM o_orderdate)::BIGINT FROM orders WHERE o_orderstatus = 'F'
        | UNION ALL
        | SELECT 'other', EXTRACT(YEAR FROM o_orderdate)::BIGINT FROM orders WHERE o_orderstatus NOT IN ('O','F')
        |) GROUP BY bucket, yr""".stripMargin,
    "q09_scalar_string" ->
      """SELECT p_partkey, split_part(p_name, ' ', 1) AS first_word,
        | p_brand || '#' || lpad(p_size::VARCHAR, 3, '0') AS brand_code,
        | lower(trim(p_type)) AS type_norm,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants,
        | coalesce(nullif(split_part(p_name, ' ', 3), ''), 'none') AS third_word,
        | p_size::DOUBLE AS size_d, length(p_name)::BIGINT AS name_len
        |FROM part""".stripMargin,
    "q10_case_date" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
        |      WHEN o_orderpriority = '3-MEDIUM' THEN 'medium' ELSE 'low' END AS prio_class,
        | o_orderdate::DATE AS order_date,
        | EXTRACT(YEAR FROM o_orderdate)::BIGINT AS yr,
        | EXTRACT(MONTH FROM o_orderdate)::BIGINT AS mo,
        | (dayofweek(o_orderdate) + 1)::BIGINT AS dow,
        | dayofweek(o_orderdate) IN (0, 6) AS is_weekend,
        | (o_orderdate::DATE + INTERVAL 1 DAY)::DATE AS next_day
        |FROM orders""".stripMargin,
    "q11_explode_tokens" ->
      """SELECT tok, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |WHERE tok != '' GROUP BY tok""".stripMargin,
    "q12_upsert" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        | target AS (SELECT o_orderkey, o_orderstatus, o_totalprice*0.9 AS o_totalprice
        |            FROM o WHERE o_orderkey % 3 != 0),
        | source AS (SELECT * FROM o WHERE o_orderkey % 2 = 0)
        |SELECT * FROM source
        |UNION ALL
        |SELECT * FROM target t WHERE NOT EXISTS
        | (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)""".stripMargin,
    "q13_haversine" ->
      """WITH pts AS (SELECT n_nationkey AS id, n_regionkey AS rk,
        |   ((n_nationkey*37) % 360 - 180 + 0.5)::DOUBLE AS lon,
        |   ((n_nationkey*17) % 180 - 90 + 0.5)::DOUBLE AS lat FROM nation),
        | pairs AS (SELECT a.rk AS rk, a.id AS id_a, b.id AS id_b,
        |   radians(a.lat) AS la1, radians(b.lat) AS la2,
        |   radians(b.lat) - radians(a.lat) AS dla,
        |   radians(b.lon) - radians(a.lon) AS dlo
        |  FROM pts a JOIN pts b ON a.rk = b.rk AND a.id < b.id),
        | h AS (SELECT rk, id_a, id_b,
        |   pow(sin(dla/2), 2) + cos(la1)*cos(la2)*pow(sin(dlo/2), 2) AS s
        |  FROM pairs)
        |SELECT rk, id_a, id_b,
        | round(2*6371008.8*atan2(sqrt(s), sqrt(1-s))/1000.0, 3) AS dist_km FROM h""".stripMargin,
    "q14_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn::BIGINT AS rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        | FROM orders) WHERE rn <= 3""".stripMargin,
    "q15_sort_limit" ->
      """SELECT l_orderkey, l_linenumber::BIGINT AS line_no, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 10""".stripMargin,
    "q16_distinct" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "q17_minmax" ->
      """SELECT l_returnflag, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        | min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
        | count(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q46_set_ops" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1995),
        | b AS (SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1996)
        |SELECT o_custkey, 'both' AS op FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |UNION ALL
        |SELECT o_custkey, 'only_1995' FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |UNION ALL
        |SELECT o_custkey, 'only_1996' FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
        |UNION ALL
        |SELECT o_custkey, 'either' FROM (SELECT * FROM a UNION SELECT * FROM b)""".stripMargin)
}
