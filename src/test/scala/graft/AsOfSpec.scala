package graft

import java.sql.Timestamp
import graft.operators.{AsOf, Skew}

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("asofJoin picks latest right row at-or-before left time, null when none") {
    val quotes = Seq(
      (1L, ts(1), 10.0), (1L, ts(5), 50.0), (1L, ts(9), 90.0),
      (2L, ts(4), 40.0)).toDF("sym", "qts", "px")
    val trades = Seq(
      (1L, ts(1), "t1"),  // exact tie → matches ts(1) quote (<= semantics)
      (1L, ts(6), "t2"),  // between → ts(5)
      (1L, ts(20), "t3"), // after all → ts(9)
      (2L, ts(3), "t4"),  // before any → null
      (3L, ts(5), "t5")   // key never quoted → null
    ).toDF("sym", "tts", "tid")
    val got = AsOf.asofJoin(trades, quotes, "sym", "sym", "tts", "qts", Seq("px"))
      .select("tid", "asof_px").as[(String, Option[Double])].collect().toMap
    assert(got === Map("t1" -> Some(10.0), "t2" -> Some(50.0), "t3" -> Some(90.0),
      "t4" -> None, "t5" -> None))
  }

  test("asofJoin ignores null and unparseable right times") {
    val right = Seq(
      (1L, null.asInstanceOf[String], 111.0),   // null time
      (1L, "not a timestamp", 222.0),           // unparseable → null after cast
      (1L, "2024-01-05 00:00:00", 50.0)).toDF("k", "rt", "v")
    val left = Seq((1L, ts(3), "early"), (1L, ts(9), "late")).toDF("k", "lt", "id")
    val got = AsOf.asofJoin(left, right, "k", "k", "lt", "rt", Seq("v"))
      .select("id", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(got === Map("early" -> None, "late" -> Some(50.0)))
  }

  test("asofJoin tiebreak: highest rightOrder wins at equal (key, time)") {
    val right = Seq((1L, ts(1), 100.0, 1.0), (1L, ts(1), 200.0, 2.0)).toDF("k", "rt", "v", "ord")
    val left = Seq((1L, ts(2), "x")).toDF("k", "lt", "id")
    val got = AsOf.asofJoin(left, right, "k", "k", "lt", "rt", Seq("v"), rightOrder = Some("ord"))
      .select("asof_v").as[Double].head()
    assert(got === 200.0)
  }

  test("saltedJoin is row-identical to the plain inner join") {
    val left = Seq.tabulate(100)(i => (i % 3, s"l$i")).toDF("k", "lv")
    val right = Seq((0, "r0"), (1, "r1"), (1, "r1b"), (5, "r5")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
    val salted = Skew.saltedJoin(left, right, Seq("k"), salt = 8)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === plain.count())
  }

  test("asofJoin: null keys never match each other (left gets null asof, null-key right ignored)") {
    val right = Seq((Option.empty[Long], ts(1), 666.0), (Some(1L), ts(1), 100.0))
      .toDF("k", "rt", "v")
    val left = Seq((Option.empty[Long], ts(2), "nullkey"), (Some(1L), ts(2), "keyed"))
      .toDF("k", "lt", "id")
    val got = AsOf.asofJoin(left, right, "k", "k", "lt", "rt", Seq("v"))
      .select("id", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(got === Map("nullkey" -> None, "keyed" -> Some(100.0)))
  }

  test("saltedJoinHot is row-identical to the plain inner join (dup rows, null keys, hot misses)") {
    // key 1 is hot (60% of rows), key 7 is listed hot but absent from the
    // right side, nulls never match, and byte-identical duplicate left rows
    // must keep their multiplicity through the union of the two paths
    val left = (Seq.tabulate(100)(i => (Option(if (i % 5 < 3) 1 else i % 5), s"l$i")) ++
      Seq((Some(1), "dup"), (Some(1), "dup"), (None, "nul"), (Some(7), "hotmiss")))
      .toDF("k", "lv")
    val right = Seq((Some(0), "r0"), (Some(1), "r1"), (Some(1), "r1b"),
      (Some(2), "r2"), (None, "rnul")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
    val hot = Skew.saltedJoinHot(left, right, Seq("k"), salt = 4, hotKeys = Seq(1, 7))
    assert(hot.exceptAll(plain).isEmpty && plain.exceptAll(hot).isEmpty)
    assert(hot.count() === plain.count())
  }

  test("saltedJoinHot plan: explode only on the hot branch, cold branch replication-free") {
    val left = Seq.tabulate(50)(i => (i % 5, s"l$i")).toDF("k", "lv")
    val right = Seq.tabulate(10)(i => (i, s"r$i")).toDF("k", "rv")
    val plan = Skew.saltedJoinHot(left, right, Seq("k"), salt = 8, hotKeys = Seq(1))
      .queryExecution.executedPlan.toString
    // exactly one Generate(explode): the hot branch's salt replication —
    // the cold branch joins unreplicated or the operator defeats its point
    assert("(?i)generate".r.findAllIn(plan).size === 1, plan.take(2000))
  }

  test("hotKeysSketch: detected keys ⊇ exact keys above the n/k threshold, native type, heaviest first") {
    // skewed fixture: key 1 = 50%, key 2 = 25%, the rest a long uniform
    // tail — the q42h shape, but fed through the combinable sketch
    val n = 4000
    val df = Seq.tabulate(n) { i =>
      val k: Long = if (i % 4 < 2) 1L else if (i % 4 == 2) 2L else 100L + i % 37
      (k, s"v$i")
    }.toDF("k", "v")
    val exact = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k = 10
    val got = Skew.hotKeysSketch(df, "k", k = k, minShare = 1.0 / k)
    // containment: every key with f_true > n/k must be detected (the
    // Misra–Gries guarantee + exact verify); here that's keys 1 and 2
    val mustHave = exact.filter(_._2 > n.toDouble / k).keys.toSet
    assert(mustHave === Set(1L, 2L)) // fixture sanity
    assert(mustHave.forall(got.contains), s"got $got")
    // verified threshold: nothing below minShare·n survives the cut
    got.foreach(key => assert(exact(key.asInstanceOf[Long]) > n.toDouble / k))
    // native type + heaviest-first ordering (the saltedJoinHot handoff)
    assert(got === Seq(1L, 2L))
    // the handoff composes: the sketch-fed hot list reproduces the join
    val right = Seq((1L, "r1"), (2L, "r2"), (100L, "r100")).toDF("k", "rv")
    val plain = df.join(right, Seq("k"))
    val hot = Skew.saltedJoinHot(df, right, Seq("k"), salt = 4, hotKeys = got)
    assert(hot.exceptAll(plain).isEmpty && plain.exceptAll(hot).isEmpty)
  }

  test("hotKeysSketch rejects a minShare below the sketch's containment guarantee") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.hotKeysSketch(df, "k", k = 10, minShare = 0.05)
    }
  }

  test("saltedJoin stays a drop-in when the left frame carries a map column") {
    val left = Seq.tabulate(20)(i => (i % 3, s"l$i", Map("a" -> i)))
      .toDF("k", "lv", "attrs")
    val right = Seq((0, "r0"), (1, "r1")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).drop("attrs")
    val salted = Skew.saltedJoin(left, right, Seq("k"), salt = 4).drop("attrs")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
