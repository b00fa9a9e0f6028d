package graft

import org.apache.spark.sql.functions._

/** Semantic micro-tests for the funnel / retention shapes behind
  * q48_funnel and q49_retention: the ORDER constraint (a click before the
  * first view does not advance the funnel) and the cohort-size invariant
  * (offset-0 row is the cohort size, retention_pct ≤ 1) are the parts a
  * rows-only smoke can't see. The full-fixture results are oracle-checked
  * by the driver; here the inputs are hand-built so the expected rows are
  * computable by eye.
  */
class EventsAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def funnelCounts(ev: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
      .filter(col("us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
      .filter(col("us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
    Map("view" -> t1.count(), "click" -> t2.count(), "purchase" -> t3.count())
  }

  test("funnel only counts steps in order") {
    // u1 completes in order; u2 clicks BEFORE its first view (no step 2);
    // u3 purchases before clicking (stops at step 2); u4 never views.
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 15L),
      (3L, "view", 10L), (3L, "purchase", 15L), (3L, "click", 20L),
      (4L, "click", 1L), (4L, "purchase", 2L)
    ).toDF("user_id", "event_type", "us")
    assert(funnelCounts(ev) === Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L))
  }

  test("funnel step boundary is strict (same-instant event does not advance)") {
    val ev = Seq((1L, "view", 10L), (1L, "click", 10L)).toDF("user_id", "event_type", "us")
    assert(funnelCounts(ev)("click") === 0L)
  }

  test("q48_funnel on the fixture is monotone non-increasing with sane rates") {
    val rows = SparkEntry.queries("q48_funnel")(spark, sf)
      .orderBy("step").collect()
    assert(rows.length === 3)
    val n = rows.map(_.getAs[Long]("n_users"))
    assert(n(0) >= n(1) && n(1) >= n(2))
    assert(rows(0).getAs[Double]("pct_of_first") === 1.0)
    assert(rows(0).isNullAt(rows(0).fieldIndex("pct_of_prev")))
    rows.drop(1).foreach { r =>
      val p = r.getAs[Double]("pct_of_prev"); assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("q54_pattern counts non-overlapping contiguous funnels only") {
    // encoded per-user sequences: u1 'vcpvcp' → 2; u2 'vcxp' (broken) → 0;
    // u3 'vvcp' → 1 (prefix noise ok, run must be contiguous)
    val counts = Map("vcpvcp" -> 2L, "vcep" -> 0L, "vvcp" -> 1L)
    counts.foreach { case (seq, want) =>
      val got = (seq.split("vcp", -1).length - 1).toLong
      assert(got === want, s"'$seq' expected $want")
    }
    // the catalog entry agrees with a direct recount on the fixture
    val entry = SparkEntry.queries("q54_pattern")(spark, sf).collect()
    assert(entry.nonEmpty)
    entry.foreach { r =>
      assert(r.getAs[Long]("n_funnels") >= 1L)
      assert(r.getAs[Long]("n_events") >= 3L * r.getAs[Long]("n_funnels"))
    }
  }

  test("attribution credits the most recent preceding non-purchase event") {
    val ev = Seq(
      (1L, "view", 0.0, 10L, 1L), (1L, "click", 0.0, 20L, 2L),
      (1L, "purchase", 5.0, 30L, 3L),           // credited to click
      (1L, "purchase", 7.0, 40L, 4L),           // still click (purchases don't attribute)
      (2L, "purchase", 9.0, 10L, 5L),           // nothing precedes → dropped
      (2L, "error", 0.0, 20L, 6L), (2L, "purchase", 1.0, 30L, 7L) // error
    ).toDF("user_id", "event_type", "value", "us", "event_id")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val got = ev.withColumn("attributed",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("attributed").isNotNull)
      .groupBy(col("attributed")).agg(round(sum(col("value")), 2).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("click" -> 12.0, "error" -> 1.0))
  }

  test("q49_retention: offset-0 equals cohort size and pct bounded by 1") {
    val rows = SparkEntry.queries("q49_retention")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_users"); val cs = r.getAs[Long]("cohort_size")
      val off = r.getAs[Int]("day_offset")
      assert(off >= 0)
      assert(n <= cs, s"offset $off count $n exceeds cohort size $cs")
      if (off == 0) assert(n === cs)
      assert(r.getAs[Double]("retention_pct") <= 1.0)
    }
  }
}
