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
}
