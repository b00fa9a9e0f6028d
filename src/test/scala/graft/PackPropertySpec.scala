package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.{Pack, Split}

/** Property tests for the deterministic split/pack family over randomized
  * corpora (plain ScalaCheck generators, fixed seeds for reproducibility —
  * the UpsertPropertySpec pattern).
  */
class PackPropertySpec extends SparkSpec {
  import spark.implicits._

  // ids unique; token counts include degenerate (0) and budget-straddling
  // (multi-budget) documents
  private def corpusGen(maxTokens: Int): Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(5, 40)
    toks <- Gen.listOfN(n, Gen.choose(0L, maxTokens.toLong))
  } yield toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def cases(n: Int, maxTokens: Int): Seq[List[(Long, Long)]] =
    (0 until n).map(i =>
      corpusGen(maxTokens).apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("packSequences properties: conservation, tiling, fills, bounded pieces") {
    for (rows <- cases(8, 40); budget <- Seq(7L, 16L)) {
      val docs = rows.toDF("doc_id", "n_tokens")
      val packed = Pack.packSequences(docs, "doc_id", "n_tokens", budget, shards = 4)
        .as[(Long, Int, Long, Long, Long)].collect() // id, shard, seq, start, len
      val positive = rows.filter(_._2 > 0)
      // conservation: every positive-count doc's tokens all land
      assert(packed.map(_._5).sum === positive.map(_._2).sum, s"rows=$rows budget=$budget")
      // per-doc tiling: pieces start at 0, contiguous, sum to the doc size
      packed.groupBy(_._1).foreach { case (id, ps) =>
        val sorted = ps.sortBy(_._3)
        assert(sorted.head._4 === 0L)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4 + a._5 === b._4, s"gap in doc $id: $sorted")
            assert(b._3 === a._3 + 1, s"doc pieces must touch consecutive seqs: $sorted")
          case _ =>
        }
        assert(sorted.map(_._5).sum === rows.find(_._1 == id).get._2)
        assert(ps.forall(_._5 > 0) && ps.forall(_._5 <= budget))
      }
      // per (shard, seq) fill: exactly budget except the shard's last seq
      packed.groupBy(p => (p._2, p._3)).foreach { case ((shard, seq), ps) =>
        val fill = ps.map(_._5).sum
        val lastSeq = packed.filter(_._2 == shard).map(_._3).max
        if (seq < lastSeq) assert(fill === budget, s"non-final seq ($shard,$seq) fill=$fill")
        else assert(fill <= budget)
      }
    }
  }

  test("assignSplit properties: total partition, weight-boundary stability under random weights") {
    for (rows <- cases(6, 10)) {
      val docs = rows.toDF("doc_id", "n_tokens")
      val n = docs.count()
      val s1 = Split.assignSplit(docs, col("doc_id"), Seq("a" -> 3.0, "b" -> 1.0))
      assert(s1.count() === n)
      assert(s1.filter(!col("split").isin("a", "b")).count() === 0)
      // growing b at a's expense: rows may move a->b only
      val s2 = Split.assignSplit(docs, col("doc_id"), Seq("a" -> 2.0, "b" -> 2.0))
      val moved = s1.select(col("doc_id"), col("split").as("x"))
        .join(s2.select(col("doc_id"), col("split").as("y")), "doc_id")
        .filter(col("x") =!= col("y"))
        .select("x", "y").distinct().as[(String, String)].collect().toSet
      assert(moved.subsetOf(Set(("a", "b"))), s"unexpected moves $moved")
    }
  }
}
