package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR semantics on a hand-built corpus: documents made of
  * target-exclusive vocabulary must outweigh documents made of
  * raw-only vocabulary, empty documents score 0, and the rank cut keeps
  * exactly ⌈frac·N⌉ documents.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha alpha beta", true),   // target exemplars
    (2L, "alpha beta beta", true),
    (3L, "alpha beta gamma", false),  // raw doc sharing target vocabulary
    (4L, "delta delta epsilon", false), // raw doc with raw-only vocabulary
    (5L, "", false)                   // empty
  ).toDF("doc_id", "text", "tgt")

  test("target-vocabulary documents outweigh raw-only documents") {
    val w = Dsir.importanceWeights(docs, col("tgt"), "doc_id", "text", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(3) > w(4), s"shared-vocab doc ${w(3)} should beat raw-only ${w(4)}")
    assert(w(1) > w(4) && w(2) > w(4))
    assert(w(5) === 0.0)
  }

  test("selectTopFraction keeps exactly ceil(frac*N) rows") {
    val w = Dsir.importanceWeights(docs, col("tgt"), "doc_id", "text", buckets = 64)
    val sel = Dsir.selectTopFraction(w, 0.4, "doc_id")
    assert(sel.filter(col("selected")).count() === 2) // ceil(0.4*5)
    // ranks are a permutation of 1..N
    assert(sel.select("rnk").as[Int].collect().sorted.toSeq === (1 to 5))
  }

  test("threshold scale path agrees with the rank cut away from ties") {
    val w = Dsir.importanceWeights(docs, col("tgt"), "doc_id", "text", buckets = 64)
    val t = Dsir.thresholdForFraction(w, 0.4)
    val byThreshold = Dsir.selectAboveThreshold(w, t)
      .filter(col("selected")).select("doc_id").as[Long].collect().toSet
    val byRank = Dsir.selectTopFraction(w, 0.4, "doc_id")
      .filter(col("selected")).select("doc_id").as[Long].collect().toSet
    // sketched quantile may keep a superset at the boundary, never lose a
    // top-ranked doc
    assert(byRank.subsetOf(byThreshold))
  }

  test("sketch threshold is the exact order statistic while accuracy >= N") {
    // the 10x-fixture lesson pinned at unit scale: at the default 10^4
    // accuracy a 50 000-row frame flips boundary ties (rank error
    // N/accuracy = 5); with accuracy >= N the percentile sketch degrades
    // to exact and the cut IS the (1-frac) order statistic, so the
    // threshold selection must equal the rank cut row-for-row, ties
    // included. 50 001 distinct weights, shuffled deterministically so
    // the sketch sees them unordered.
    val n = 50001
    val weights = spark.range(n)
      .select(col("id").as("doc_id"),
        // bijective scramble: weight order decorrelated from insert order
        // 40507 is coprime to 50001 = 3·7·2381, so the map is bijective
        (pmod(col("id") * 40507L, lit(n.toLong)) / lit(n.toDouble)).as("weight"))
    val frac = 0.25
    val t = Dsir.thresholdForFraction(weights, frac, accuracy = 1 << 20)
    // the threshold is an actual data value (discrete quantile, no
    // interpolation) ...
    assert(weights.filter(col("weight") === t).count() === 1L)
    val byThreshold = Dsir.selectAboveThreshold(weights, t)
      .filter(col("selected")).select("doc_id").as[Long].collect().toSet
    val byRank = Dsir.selectTopFraction(weights, frac, "doc_id")
      .filter(col("selected")).select("doc_id").as[Long].collect().toSet
    // ... and the cut sits within ONE order statistic of the exact rank
    // cut, never losing a top-ranked doc — at the 10^4 default this same
    // N drifts by up to N/accuracy = 5 ranks on either side (the 10×
    // sweep measured exactly 5 flipped rows)
    assert(byRank.subsetOf(byThreshold),
      s"threshold cut lost top-ranked docs: ${(byRank -- byThreshold).take(5)}")
    assert(byThreshold.size - byRank.size <= 1,
      s"exact-regime boundary wider than one order statistic: " +
        s"${byThreshold.size} vs ${byRank.size}")
  }

  test("buckets must be a power of two") {
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(docs, col("tgt"), "doc_id", "text", buckets = 100).count()
    }
  }
}
