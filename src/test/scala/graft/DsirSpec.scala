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

  test("buckets must be a power of two") {
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(docs, col("tgt"), "doc_id", "text", buckets = 100).count()
    }
  }
}
