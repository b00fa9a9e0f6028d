package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Upsert

/** Event-stream-shaped batch queries over the `events` fixture: DISTINCT ON,
  * tumbling-window aggregation, JSON field extraction, gap sessionization,
  * ordered-step funnel, cohort retention. The first four are the batch
  * twins of the streaming module's jobs — same semantics, bounded input.
  *
  * Timestamp parity: `Tables.events` normalizes `ts` to µs regardless of
  * the fixture's physical encoding (INT64 nanos or TIMESTAMP micros); the
  * DuckDB side reads TIMESTAMP natively (`epoch_ns(ts)//1000` for the µs
  * integer) so both engines order and emit identical values.
  */
object Events {

  private def E(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  /** DuckDB expression equivalent of Tables.events' µs-truncated ts. */
  private val tsUs = "make_timestamp(epoch_ns(ts)//1000)"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2 DISTINCT ON: first event per user with a deterministic tiebreak.
    "q07_distinct_on" -> ((s, d) => {
      Upsert.distinctOn(E(s, d), Seq("user_id"), Seq(col("ts").asc, col("event_id").asc))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts"))
    }),

    // Tumbling hourly window aggregation (batch twin of the streaming job).
    "q18_event_window" -> ((s, d) => {
      E(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // JSON field extraction (reference's nested-record surface). Spark side
    // uses the JSON path evaluator; the oracle extracts the same value by
    // regex so it needs no DuckDB JSON extension — equal outputs.
    "q19_json_extract" -> ((s, d) => {
      E(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), round(avg(col("k")), 6).as("avg_k"))
    }),

    // Gap-based sessionization (30-min inactivity): lag + running sum of
    // session-break flags — single shuffle on user_id, rank streamed.
    "q20_sessionize" -> ((s, d) => {
      val us = expr("ts_ns div 1000")
      val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc, col("event_id").asc)
      E(s, d)
        .withColumn("us", us)
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(w))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          timestamp_micros(min(col("us"))).as("session_start"),
          timestamp_micros(max(col("us"))).as("session_end"),
          round(sum(col("value")), 2).as("session_value"))
    }),

    // Ordered-step funnel (first-touch): a user reaches step N when the
    // step-N event strictly follows their step-(N-1) entry time. Three
    // conditional MIN aggregations, each an equi-join on user_id — at scale
    // every pass shuffles on the same key, so AQE/exchange reuse keeps it
    // one partitioning; no window over the full event stream is needed.
    "q48_funnel" -> ((s, d) => {
      val ev = E(s, d).select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
        .filter(col("us") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
        .filter(col("us") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
      def step(df: DataFrame, n: Int, name: String) =
        df.agg(count(lit(1)).as("n_users"))
          .withColumn("step", lit(n)).withColumn("step_name", lit(name))
      val steps = step(t1, 1, "view")
        .unionByName(step(t2, 2, "click"))
        .unionByName(step(t3, 3, "purchase"))
      // 3-row frame: the global window is fine
      val w = Window.orderBy(col("step"))
      steps
        .withColumn("pct_of_first",
          round(col("n_users").cast("double") / first(col("n_users")).over(w), 6))
        .withColumn("pct_of_prev",
          round(col("n_users").cast("double") / lag(col("n_users"), 1).over(w), 6))
        .select(col("step"), col("step_name"), col("n_users"),
          col("pct_of_first"), col("pct_of_prev"))
    }),

    // Cohort retention: cohort = the user's first active day; one distinct
    // count per (cohort day, day offset). Two aggregations over the same
    // user_id partitioning; the cohort size rides a per-cohort window over
    // the already-small result (offset 0 exists for every cohort by
    // construction — it is the first-event day itself).
    "q49_retention" -> ((s, d) => {
      val ev = E(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val counts = ev.join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val w = Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      counts
        .withColumn("cohort_size", first(col("n_users")).over(w))
        .withColumn("retention_pct",
          round(col("n_users").cast("double") / col("cohort_size"), 6))
        .select(col("cohort_day"), col("day_offset"), col("n_users"),
          col("cohort_size"), col("retention_pct"))
    }),

    // SCD2 dimension build: the per-user event_type change stream collapsed
    // to validity intervals (consecutive duplicates merge; valid_to =
    // next run's start, NULL while current). The lookup side of this
    // interval table is exactly q27's as-of join.
    "q51_scd2" -> ((s, d) => {
      val ev = E(s, d).select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"), col("event_id"))
      graft.operators.Scd2.buildScd2(ev, Seq("user_id"), Seq("event_type"),
          "us", tieBreak = Seq(col("event_id").asc))
        .select(col("user_id"), col("event_type"),
          timestamp_micros(col("valid_from")).as("valid_from"),
          timestamp_micros(col("valid_to")).as("valid_to"),
          col("is_current"))
    }),

    // Volume anomaly detection: hourly counts per event type z-scored
    // against that type's own distribution. Moments come from exact
    // integer sums (count, Σn, Σn²) so mean/σ/z are bit-deterministic —
    // no Welford ordering to disagree on; the 5-row stats frame
    // broadcasts back onto the hourly grid.
    "q52_anomaly" -> ((s, d) => {
      val hourly = E(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val st = hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("n")).as("sn"),
          sum(col("n") * col("n")).as("sn2"))
      hourly.join(broadcast(st), "event_type")
        .withColumn("mean", col("sn").cast("double") / col("cnt"))
        .withColumn("sd",
          sqrt(col("sn2").cast("double") / col("cnt") - col("mean") * col("mean")))
        .withColumn("z",
          when(col("sd") > 0, round((col("n") - col("mean")) / col("sd"), 6))
            .otherwise(lit(0.0)))
        .withColumn("is_anomaly", abs(col("z")) > 2.0)
        .select(col("window_start"), col("event_type"), col("n"),
          round(col("mean"), 6).as("mean"), col("z"), col("is_anomaly"))
    }),

    // Sequence-pattern matching (the CEP/MATCH_RECOGNIZE shape, batch
    // form): each user's event history becomes an ordered initial-letter
    // string, and contiguous view→click→purchase runs are counted as
    // non-overlapping regex matches. One groupBy with an order-pinned
    // string aggregation — the per-user sequence is bounded by user
    // history, never corpus-wide.
    "q54_pattern" -> ((s, d) => {
      val ev = E(s, d).select(col("user_id"),
        substring(col("event_type"), 1, 1).as("c"),
        expr("ts_ns div 1000").as("us"), col("event_id"))
      val seqs = ev
        .withColumn("__ord", struct(col("us"), col("event_id")))
        .groupBy(col("user_id"))
        .agg(concat_ws("", transform(array_sort(
          collect_list(struct(col("__ord"), col("c")))),
          x => x.getField("c"))).as("seq"))
      seqs.select(col("user_id"), length(col("seq")).cast("long").as("n_events"),
          (size(split(col("seq"), "vcp", -1)) - 1).cast("long").as("n_funnels"))
        .filter(col("n_funnels") > 0)
    }),

    // Last-touch attribution: every purchase credits the user's most
    // recent PRECEDING non-purchase event. IGNORE-NULLS last_value over
    // the per-user ordering — one shuffle on user_id; the report is the
    // per-channel credit count and value.
    "q55_attribution" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      E(s, d).select(col("user_id"), col("event_type"), col("value"),
          expr("ts_ns div 1000").as("us"), col("event_id"))
        .withColumn("attributed",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" && col("attributed").isNotNull)
        .groupBy(col("attributed"))
        // value sum folded in event order (the BM25 discipline) — a plain
        // SUM of hundreds of doubles could straddle a cent boundary
        // differently per partitioning
        .agg(count(lit(1)).as("n_purchases"),
          round(graft.functions.Expressions.foldSumField(
            array_sort(collect_list(struct(col("event_id"), col("value"))))),
            2).as("attributed_value"))
    }))

  val oracle: Map[String, String] = Map(
    "q07_distinct_on" ->
      s"""SELECT user_id, event_id, event_type, value, $tsUs AS ts FROM (
         | SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY $tsUs ASC, event_id ASC) AS rn
         | FROM events) WHERE rn = 1""".stripMargin,
    "q18_event_window" ->
      s"""SELECT date_trunc('hour', $tsUs) AS window_start, event_type,
         | count(*) AS n, round(sum(value), 2) AS total_value,
         | count(DISTINCT user_id) AS n_users
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q19_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | sum(regexp_extract(props, '"k": (\d+)', 1)::BIGINT)::BIGINT AS sum_k,
        | round(avg(regexp_extract(props, '"k": (\d+)', 1)::BIGINT), 6) AS avg_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q20_sessionize" ->
      """WITH base AS (SELECT user_id, event_id, value, epoch_ns(ts)//1000 AS us FROM events),
        | lagged AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) AS prev_us FROM base),
        | flagged AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM lagged),
        | sess AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) AS session_id FROM flagged)
        |SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
        | make_timestamp(min(us)) AS session_start, make_timestamp(max(us)) AS session_end,
        | round(sum(value), 2) AS session_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,
    "q48_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
        | t1 AS (SELECT user_id, min(us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
        | t2 AS (SELECT e.user_id, min(us) AS t2 FROM ev e JOIN t1 USING (user_id)
        |   WHERE event_type = 'click' AND us > t1 GROUP BY 1),
        | t3 AS (SELECT e.user_id, min(us) AS t3 FROM ev e JOIN t2 USING (user_id)
        |   WHERE event_type = 'purchase' AND us > t2 GROUP BY 1),
        | steps AS (
        |  SELECT 1 AS step, 'view' AS step_name, count(*) AS n_users FROM t1
        |  UNION ALL SELECT 2, 'click', count(*) FROM t2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM t3)
        |SELECT step::INT AS step, step_name, n_users::BIGINT AS n_users,
        | round(n_users::DOUBLE / first(n_users) OVER (ORDER BY step), 6) AS pct_of_first,
        | round(n_users::DOUBLE / lag(n_users) OVER (ORDER BY step), 6) AS pct_of_prev
        |FROM steps""".stripMargin,
    "q49_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        | cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
        | counts AS (SELECT cohort_day, date_diff('day', cohort_day, day)::INT AS day_offset,
        |   count(DISTINCT user_id) AS n_users
        |  FROM ev JOIN cohort USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_day, day_offset, n_users::BIGINT AS n_users,
        | first(n_users::BIGINT) OVER (PARTITION BY cohort_day ORDER BY day_offset) AS cohort_size,
        | round(n_users::DOUBLE / first(n_users) OVER (PARTITION BY cohort_day ORDER BY day_offset), 6) AS retention_pct
        |FROM counts""".stripMargin,
    "q51_scd2" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS us, event_id FROM events),
        | lagged AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) AS prev,
        |   row_number() OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) AS rn FROM ev),
        | runs AS (SELECT user_id, event_type, us, event_id FROM lagged
        |   WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        | iv AS (SELECT user_id, event_type, us AS vf,
        |   lead(us) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) AS vt
        |  FROM runs)
        |SELECT user_id, event_type, make_timestamp(vf) AS valid_from,
        | make_timestamp(vt) AS valid_to, vt IS NULL AS is_current
        |FROM iv""".stripMargin,
    "q52_anomaly" ->
      s"""WITH hourly AS (SELECT date_trunc('hour', $tsUs) AS window_start, event_type,
         |   count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
         | st AS (SELECT event_type, count(*)::BIGINT AS cnt, sum(n)::BIGINT AS sn,
         |   sum(n*n)::BIGINT AS sn2 FROM hourly GROUP BY 1),
         | j AS (SELECT h.window_start, h.event_type, h.n,
         |   sn::DOUBLE / cnt AS mean,
         |   sqrt(sn2::DOUBLE / cnt - (sn::DOUBLE / cnt) * (sn::DOUBLE / cnt)) AS sd
         |  FROM hourly h JOIN st USING (event_type)),
         | z AS (SELECT window_start, event_type, n, mean,
         |   CASE WHEN sd > 0 THEN round((n - mean) / sd, 6) ELSE 0.0 END AS z
         |  FROM j)
         |SELECT window_start, event_type, n, round(mean, 6) AS mean, z,
         | abs(z) > 2.0 AS is_anomaly
         |FROM z""".stripMargin,
    "q54_pattern" ->
      """WITH ev AS (SELECT user_id, substr(event_type, 1, 1) AS c,
        |   epoch_ns(ts)//1000 AS us, event_id FROM events),
        | seqs AS (SELECT user_id, string_agg(c, '' ORDER BY us ASC, event_id ASC) AS seq
        |  FROM ev GROUP BY 1)
        |SELECT user_id, length(seq)::BIGINT AS n_events,
        | (len(string_split(seq, 'vcp')) - 1)::BIGINT AS n_funnels
        |FROM seqs WHERE len(string_split(seq, 'vcp')) - 1 > 0""".stripMargin,
    "q55_attribution" ->
      """WITH ev AS (SELECT user_id, event_type, value, epoch_ns(ts)//1000 AS us, event_id FROM events),
        | attr AS (SELECT user_id, event_type, value, event_id,
        |   last_value(CASE WHEN event_type != 'purchase' THEN event_type END IGNORE NULLS)
        |     OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attributed
        |  FROM ev)
        |SELECT attributed, count(*)::BIGINT AS n_purchases,
        | round(list_sum(list(value ORDER BY event_id)), 2) AS attributed_value
        |FROM attr WHERE event_type = 'purchase' AND attributed IS NOT NULL
        |GROUP BY attributed""".stripMargin)
}
