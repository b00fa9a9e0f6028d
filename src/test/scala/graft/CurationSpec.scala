package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: each doc exercises exactly one stage
  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "a completely different sentence with many ordinary words that is long enough to keep"),
    (3L, "short doc"), // < minTokens → gated
    (4L, "!!!!!!!!!!!!!!! !!!!!!!!!!!!!!! !!!!!!!!!!!!!!! !!!!!!!!!!!!!!! !!!!!!!!!!!!!!! " +
      "!!!!!!!!!!!!!!! !!!!!!!!!!!!!!! !!!!!!!!!!!!!!! !!!!!!!!!!!!!!! !!!!!!!!!!!!!!!"), // quality < 0.5
    (5L, "spark data spark data spark data spark data spark data"), // top-bigram loop → repetition gate
    (6L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (7L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen"),
    (8L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen sixteen"), // near dup of 7
    (9L, "this training document quotes alpha beta gamma delta epsilon verbatim plus lots of its own words"), // contaminated
    (10L, "write to jane.doe@corp.example.org with the usual questions about the data release schedule"),
    (11L, null) // null text → length gate (null tokenCount fails >= minTokens)
  ).toDF("doc_id", "text")

  private val benchmark = Seq((100L, "alpha beta gamma delta epsilon"))
    .toDF("doc_id", "text")

  test("curate: every planted hazard is removed by its stage, survivors keep structure") {
    val out = Curation.curate(corpus, benchmark, "doc_id", "text")
    val docs = out.documents.cache()
    val kept = docs.select("doc_id").as[Long].collect().toSet
    // 3 gated (length), 4 (quality), 5 (repetition), 6 (exact dup of 1),
    // 8 (near dup of 7, non-canonical), 9 (contaminated) — all gone
    assert(kept === Set(1L, 2L, 7L, 10L))
    // PII scrubbed in the canonical output text
    val piiText = docs.filter($"doc_id" === 10L).select("text").as[String].head()
    assert(piiText.contains("<EMAIL>") && !piiText.contains("jane.doe"))
    // split column totally partitions the survivors
    assert(docs.filter(!$"split".isin("train", "val", "test")).count() === 0)
    // packed sequences conserve exactly the train split's tokens
    val trainTokens = docs.filter($"split" === "train")
      .select(graft.functions.TextFns.tokenCount($"text").cast("long")).as[Long]
      .collect().sum
    val packedTokens = out.sequences.agg(sum("tok_len")).as[Long].head()
    assert(packedTokens === trainTokens)
    docs.unpersist()
  }

  test("curate: edit-distance verify stage — generous ratio is a no-op, strict keeps both near-dups") {
    val default = Curation.curate(corpus, benchmark, "doc_id", "text")
      .documents.select("doc_id").as[Long].collect().toSet
    // generous bound admits every true near-dup pair → identical output
    val generous = Curation.curate(corpus, benchmark, "doc_id", "text",
      Curation.Config(maxEditRatio = Some(0.5)))
      .documents.select("doc_id").as[Long].collect().toSet
    assert(generous === default)
    // near-zero bound rejects the 7/8 pair (they differ by one word), so
    // BOTH survive as their own cluster canonical; nothing else changes
    val strict = Curation.curate(corpus, benchmark, "doc_id", "text",
      Curation.Config(maxEditRatio = Some(0.001)))
      .documents.select("doc_id").as[Long].collect().toSet
    assert(strict === (default + 8L))
  }

  test("curate: near-dup canonical keeps the min id; rerun is deterministic") {
    val out1 = Curation.curate(corpus, benchmark, "doc_id", "text").documents
    assert(out1.filter($"doc_id" === 7L).count() === 1) // 7 < 8 → 7 canonical
    val out2 = Curation.curate(corpus, benchmark, "doc_id", "text").documents
    assert(out1.except(out2).count() === 0 && out2.except(out1).count() === 0)
  }
}
