package graft

import graft.operators.LmScore

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("bigramNll: hand-computed add-one bigram LM on a 3-doc corpus") {
    val d = Seq((1L, "a b a b"), (2L, "a b"), (3L, "z")).toDF("id", "text")
    val got = LmScore.bigramNll(d, "id", "text")
      .as[(Long, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    // corpus: c(a,b)=3, c(b,a)=1; contexts c(a)=3, c(b)=1; V=3 (a,b,z)
    // p(b|a) = (3+1)/(3+3) = 2/3; p(a|b) = (1+1)/(1+3) = 1/2
    val ab = -math.log(2.0 / 3.0); val ba = -math.log(0.5)
    val d1 = (ab + ba + ab) / 3.0; val d2 = ab
    assert(got.map(r => (r._1, r._2)) === Seq((1L, 3L), (2L, 1L), (3L, 0L)))
    assert(math.abs(got(0)._3.get - d1) < 1e-6)
    assert(math.abs(got(1)._3.get - d2) < 1e-6)
    assert(got(2)._3.isEmpty)
    // the corpus-typical doc scores lower (better) than the rare transition
    assert(got(0)._3.get > got(1)._3.get) // doc1 contains the rarer (b,a)
  }

  test("nllBuckets: even rank-tertiles over scored docs; unscored rows excluded") {
    val d = (1L to 9L).map(i => (i, s"tok$i tok${i % 3} shared word"))
      .toDF("id", "text").unionByName(Seq((10L, "solo")).toDF("id", "text"))
    val scored = LmScore.bigramNll(d, "id", "text")
    val got = LmScore.nllBuckets(scored, "id")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got === Map("head" -> 3L, "middle" -> 3L, "tail" -> 3L))
  }

  test("bucketByApproxNll: map-side assignment covers every scored row, null stays null") {
    val d = (1L to 30L).map(i => (i, s"w$i w${i % 5} w${i % 3} common"))
      .toDF("id", "text").unionByName(Seq((99L, "x")).toDF("id", "text"))
    val scored = LmScore.bigramNll(d, "id", "text")
    val b = LmScore.bucketByApproxNll(scored)
    val byBucket = b.filter($"nll".isNotNull).groupBy("bucket").count()
      .as[(String, Long)].collect().toMap
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    assert(byBucket.values.sum === 30L) // every scored row lands in exactly one bucket
    // value thresholds + tied nlls make sizes approximate (unlike the exact
    // rank variant): assert coverage, not even thirds
    assert(byBucket.size >= 2)
    assert(b.filter($"id" === 99L).select("bucket").as[Option[String]].head().isEmpty)
  }
}
