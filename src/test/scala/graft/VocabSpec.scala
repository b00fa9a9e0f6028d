package graft

import org.apache.spark.sql.functions._
import graft.operators.Vocab

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("topNgrams: hand-checked counts, deterministic tiebreak, blocked and global") {
    val df = Seq(
      ("a", "x y x y z"),    // bigrams: "x y"×2, "y x", "y z"
      ("a", "x y"),          // +1 "x y"
      ("b", "q q q")).toDF("blk", "t")
    val blocked = Vocab.topNgrams(df, "t", n = 2, k = 2, blockCols = Seq("blk"))
      .as[(String, String, Long, Int)].collect().toSet
    assert(blocked === Set(
      ("a", "x y", 3L, 1), ("a", "y x", 1L, 2), // "y x" < "y z" asc tiebreak
      ("b", "q q", 2L, 1)))
    val global = Vocab.topNgrams(df, "t", n = 2, k = 1)
      .select("gram", "occurrences", "rank").as[(String, Long, Int)].collect().toSeq
    assert(global === Seq(("x y", 3L, 1)))
    // unigrams reduce to word count; q/x/y all tie at 3, "q" wins asc
    val uni = Vocab.topNgrams(df, "t", n = 1, k = 1)
      .select("gram", "occurrences").as[(String, Long)].collect().toSeq
    assert(uni === Seq(("q", 3L)))
  }

  test("native ngrams: equals the independent Column formulation; empty/short/null edges") {
    val docs = graft.sources.Tables.table(spark, sf, "documents")
    val ts = graft.functions.TextFns.tokens($"text")
    // independent (slow) Column form as the differential baseline
    val columnForm = when(size(ts) >= 3,
      transform(sequence(lit(0), size(ts) - 3),
        i => concat_ws(" ", element_at(ts, i + 1), element_at(ts, i + 2), element_at(ts, i + 3))))
      .otherwise(array().cast("array<string>"))
    val diff = docs.select(
      graft.functions.Expressions.ngrams($"text", 3).as("native"),
      columnForm.as("cols"))
    assert(diff.filter($"native" =!= $"cols").count() === 0)
    val edges = Seq(Some("one two"), Some("  "), Some(""), None).toDF("text")
      .select(graft.functions.Expressions.ngrams($"text", 3).as("g"))
      .as[Option[Seq[String]]].collect().toSeq
    assert(edges === Seq(Some(Seq()), Some(Seq()), Some(Seq()), None))
    // non-distinct: repeated bigrams keep every occurrence
    val rep = Seq("x y x y").toDF("text")
      .select(graft.functions.Expressions.ngrams($"text", 2)).as[Seq[String]].head()
    assert(rep === Seq("x y", "y x", "x y"))
  }

  test("topNgrams global path avoids the partitionless window (TakeOrdered plan)") {
    val docs = graft.sources.Tables.table(spark, sf, "documents")
    val q = Vocab.topNgrams(docs, "text", n = 2, k = 5)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"global top-k not heap-merged:\n$p")
  }

  test("dedupDelta: within-delta dups collapse, corpus re-submissions drop, new docs survive") {
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val corpusFps = corpus.select(
      graft.functions.TextFns.fingerprint($"text").as("fp")).distinct()
    val delta = Seq(
      (10L, "alpha  BETA"),    // normalizes to a corpus doc → dropped
      (11L, "epsilon zeta"),   // new
      (12L, "epsilon zeta"),   // within-delta dup of 11 → dropped
      (13L, "eta theta")       // new
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.dedupDelta(delta, corpusFps, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got === Seq(11L, 13L))
  }
}
