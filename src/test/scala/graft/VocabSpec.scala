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

  test("bpeMerges: hand-computed merge sequence, adjacent occurrences both merge") {
    // corpus: "abab abab abab ab ab" → word freqs: abab×3, ab×2
    // chars: abab = a b a b (pairs per word: (a,b)×2, (b,a)×1), ab = a b
    // (a,b) count = 3·2 + 2·1 = 8; (b,a) = 3 → merge 1: (a,b,8)
    // after: abab = ab ab, ab = ab → pairs: (ab,ab)×3 → merge 2: (ab,ab,3)
    val docs = Seq("abab abab abab ab ab").toDF("text")
    val merges = graft.operators.Vocab.bpeMerges(docs, "text", nMerges = 2)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(merges === Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L)))
    // adjacent-occurrence correctness: 'a b a b' must merge BOTH pairs in
    // one step (the space-doubling property) — proven by merge 2's count:
    // a left-to-right scan that missed the second occurrence would see
    // (ab, a) instead of (ab, ab)

    // determinism + tie handling: 'xy yx' has (x,y) and (y,x) both at 1 —
    // the (left, right) ascending tiebreak picks (x,y) first
    val tied = Seq("xy yx").toDF("text")
    val m1 = graft.operators.Vocab.bpeMerges(tied, "text", nMerges = 1)
      .as[(Int, String, String, Long)].head()
    assert(m1 === ((1, "x", "y", 1L)))
    // a corpus of single-char words has no pairs: merge table is empty,
    // not an error
    val empty = graft.operators.Vocab.bpeMerges(Seq("a b c").toDF("text"), "text", 3)
    assert(empty.count() === 0L)
  }

  test("bpeEncode: applies merges in order; counts match hand-derived symbolization") {
    // merges from the hand-computed corpus: (a,b) then (ab,ab)
    val docs = Seq((1L, "abab abab abab ab ab")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val enc = graft.operators.Vocab.bpeEncode(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].head()
    // abab → [abab] (1 symbol) ×3, ab → [ab] (1) ×2 → 5 BPE tokens, 5 ws tokens
    assert(enc === ((1L, 5L, 5L)))
    // a doc with unseen words falls back to characters past the merges
    val other = Seq((2L, "ba xyz ab")).toDF("doc_id", "text")
    val enc2 = graft.operators.Vocab.bpeEncode(other, "doc_id", "text", merges)
      .as[(Long, Long, Long)].head()
    // ba → b a (2), xyz → x y z (3), ab → ab (1) = 6 BPE tokens, 3 ws tokens
    assert(enc2 === ((2L, 6L, 3L)))
    // empty merge list degrades to pure character counting (2 + 3 + 2)
    val enc0 = graft.operators.Vocab.bpeEncode(other, "doc_id", "text", Nil)
      .as[(Long, Long, Long)].head()
    assert(enc0 === ((2L, 7L, 3L)))
  }

  test("collocations: hand-computed PMI, rounded-pmi ranking with gram tiebreak") {
    val d = Seq("new york new york", "san francisco", "new day").toDF("text")
    val got = graft.operators.Vocab.collocations(d, "text", minCount = 1L, topK = 10)
      .as[(String, Long, Double, Int)].collect().toSeq
    // T=5; pmi(york,new)=pmi(san,francisco)=ln 5; pmi(new,york)=pmi(new,day)=ln(5/3)
    val ln5 = BigDecimal(math.log(5.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln53 = BigDecimal(math.log(5.0 / 3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      ("san francisco", 1L, ln5, 1), ("york new", 1L, ln5, 2),
      ("new day", 1L, ln53, 3), ("new york", 2L, ln53, 4)))
  }
}
