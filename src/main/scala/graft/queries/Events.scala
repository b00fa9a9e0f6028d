package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Upsert

/** Event-stream-shaped batch queries over the `events` fixture: DISTINCT ON,
  * tumbling-window aggregation, JSON field extraction, gap sessionization.
  * These are the batch twins of the streaming module's jobs — same
  * semantics, bounded input.
  *
  * Timestamp parity: `events.ts` is INT64 nanos; both sides truncate to
  * microseconds (Spark via Tables.events, DuckDB via
  * `make_timestamp(epoch_ns(ts)//1000)`) before ordering or output so the
  * engines agree bit-for-bit.
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
        |FROM sess GROUP BY user_id, session_id""".stripMargin)
}
