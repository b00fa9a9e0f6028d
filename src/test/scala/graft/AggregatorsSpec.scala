package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("ModeAgg: most frequent wins; ties break to the smallest value") {
    val df = Seq(
      ("g1", "b"), ("g1", "b"), ("g1", "a"),           // b wins on count
      ("g2", "z"), ("g2", "a"), ("g2", "z"), ("g2", "a"), // tie a/z → a
      ("g3", "x")
    ).toDF("g", "v")
    val got = df.groupBy($"g").agg(Aggregators.mode($"v").as("m"))
      .as[(String, String)].collect().toMap
    assert(got == Map("g1" -> "b", "g2" -> "a", "g3" -> "x"))
  }

  test("ModeAgg: nulls don't count; all-null group yields null") {
    val df = Seq(
      ("g1", Option("a")), ("g1", None), ("g1", None), ("g1", Option("b")), ("g1", Option("a")),
      ("g2", None), ("g2", None)
    ).toDF("g", "v")
    val got = df.groupBy($"g").agg(Aggregators.mode($"v").as("m"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map("g1" -> Some("a"), "g2" -> None))
  }

  test("ModeAgg: unbounded domain fails fast instead of growing toward OOM") {
    // the bounded-domain contract is enforced: reduce/merge require the
    // buffer to stay under MaxDistinct, so free-text misuse dies with a
    // diagnosable message on the first offending partition
    val wide = (0 to Aggregators.ModeAgg.MaxDistinct).map(i => ("g", s"v$i"))
      .toDF("g", "v").repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      wide.groupBy($"g").agg(Aggregators.mode($"v").as("m")).collect()
    }
    assert(e.getMessage.contains("graft_mode") ||
      Option(e.getCause).exists(_.getMessage.contains("graft_mode")))
  }

  test("ModeAgg: two-phase merge across many partitions equals single-partition result") {
    val rows = (0 until 1000).map(i => ("g" + (i % 7), "v" + (i % 13)))
    val many = rows.toDF("g", "v").repartition(8)
      .groupBy($"g").agg(Aggregators.mode($"v").as("m"))
      .as[(String, String)].collect().toMap
    val one = rows.toDF("g", "v").coalesce(1)
      .groupBy($"g").agg(Aggregators.mode($"v").as("m"))
      .as[(String, String)].collect().toMap
    assert(many == one)
  }

  test("graft_mode is SQL-callable after registration") {
    Aggregators.register(spark)
    Seq(("a", "x"), ("a", "x"), ("a", "y")).toDF("g", "v")
      .createOrReplaceTempView("mode_sql_t")
    val got = spark.sql("SELECT g, graft_mode(v) AS m FROM mode_sql_t GROUP BY g")
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "x"))
  }

  test("mode aggregate plans as partial + final hash aggregate, no collect") {
    val df = Seq(("a", "x")).toDF("g", "v")
      .groupBy($"g").agg(Aggregators.mode($"v").as("m"))
    val plan = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate runs twice (partial, final) around the exchange —
    // the map-side-combine shape that keeps the UDAF shuffle-light
    assert("ObjectHashAggregate|HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("Misra–Gries: every value above n/k survives, estimates are n/k-sound, buffer bounded") {
    val k = 8
    // 1000 values: 'hot' appears 300×, 'warm' 200×, the rest spread over
    // 100 distinct cold values (5 each) — hot and warm are above n/k=125
    val data = Seq.fill(300)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 100).flatMap(i => Seq.fill(5)(s"cold$i"))
    val exact = data.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    // run through several partitionings — the guarantee must be layout-proof
    for (parts <- Seq(1, 4, 13)) {
      val summary = data.toDF("v").repartition(parts)
        .agg(Aggregators.heavyHitters(k)($"v").as("s"))
        .as[Map[String, Long]].head()
      assert(summary.size <= k - 1, s"buffer exceeded k-1: ${summary.size}")
      assert(summary.contains("hot") && summary.contains("warm"),
        s"lost a true heavy hitter at parts=$parts: ${summary.keySet}")
      summary.foreach { case (v, est) =>
        val f = exact(v)
        assert(est <= f && f <= est + data.size / k,
          s"estimate $est for $v outside [f - n/k, f]; f=$f")
      }
    }
  }

  test("qt50: MG candidates + verify-count equals the exact threshold set") {
    import org.apache.spark.sql.functions._
    val k = 32
    val tok = graft.sources.Tables.table(spark, sf, "documents").select($"lang",
      explode(graft.functions.Expressions.ngrams($"text", 1)).as("term"))
    val viaEntry = SparkEntry.queries("qt50_heavy_hitters")(spark, sf)
      .select("lang", "term", "n").as[(String, String, Long)].collect().toSet
    val exact = tok.groupBy($"lang", $"term").agg(count(lit(1)).as("n"))
      .join(tok.groupBy($"lang").agg(count(lit(1)).as("nt")), "lang")
      .filter($"n" * k > $"nt")
      .select("lang", "term", "n").as[(String, String, Long)].collect().toSet
    assert(viaEntry === exact, "sketch+verify diverged from the exact threshold set")
    assert(exact.nonEmpty)
  }
}
