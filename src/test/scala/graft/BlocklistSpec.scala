package graft

import graft.operators.Blocklist

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  test("termHits: ratio not contains — short mostly-banned dies, long doc with one hit survives") {
    val d = Seq(
      (1L, "BAD worse bad junk"),                            // 2/4 hits = 0.5
      (2L, "one bad token in a long enough document to pass the ratio gate easily overall"),
      (3L, "perfectly clean text here")).toDF("id", "text")
    val terms = Seq("bad", "worse").toDF("term")
    val got = Blocklist.termHits(d, "id", "text", terms, maxRatio = 0.1)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got(0) === ((1L, 4L, 3L, 0.75, true))) // BAD + worse + bad, case-insensitive
    assert(got(1)._3 === 1L && !got(1)._5)        // 1/14 ≈ 0.07 < 0.1
    assert(got(2) === ((3L, 4L, 0L, 0.0, false)))
    val clean = Blocklist.filterClean(d, "id", "text", terms, maxRatio = 0.1)
      .select("id").as[Long].collect().toSet
    assert(clean === Set(2L, 3L))
  }

  test("keepPredicate: native profile-hits form ≡ Column filter-HOF form") {
    import org.apache.spark.sql.functions.col
    // duplicate + mixed-case banned terms: both forms must be
    // duplicate-insensitive (isin/array_contains vs the matcher's
    // per-profile distinct) and lowercase-matched; null/empty kept
    val terms = Seq("Casino", "casino", "JACKPOT")
    val df = Seq(
      Some("casino jackpot casino prize casino bets"),
      Some("one stray casino word in a long clean document"),
      Some("CASINO SHOUTY HEADER then regular prose follows here"),
      Some("perfectly clean"), Some(""), None).toDF("t")
    val got = df.select(
        Blocklist.keepPredicate(col("t"), terms, 0.2).as("native"),
        Blocklist.keepPredicateColumns(col("t"), terms, 0.2).as("cols"))
      .as[(Option[Boolean], Option[Boolean])].collect()
    got.foreach { case (n, c) => assert(n === c) }
  }
}
