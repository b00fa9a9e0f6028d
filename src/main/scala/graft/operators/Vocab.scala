package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level n-gram vocabulary: the frequency table feeding tokenizer
  * training, stopword induction, and the corpus-statistics reports every
  * curation run publishes. Counts ALL n-gram occurrences (token
  * positions, not the distinct-per-doc shingle sets the dedup family
  * uses) and keeps the top k per block with a deterministic tiebreak.
  *
  * Plan shape: explode → count is one map-side-combinable aggregate keyed
  * by (block, gram) — the heavy reduction happens in the combiners, so
  * the shuffle carries one row per DISTINCT gram per block, not per
  * occurrence; the top-k window then runs on the already-tiny count
  * table. 100 TB of text reduces like a word count, because it is one.
  */
object Vocab {

  /** Top `k` token `n`-grams per `blockCols` group (global when empty),
    * ranked by occurrence count desc, gram asc (deterministic).
    * Output: blockCols..., `gram`, `occurrences`, `rank`.
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int,
                blockCols: Seq[String] = Nil): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(k >= 1, s"k must be >= 1: $k")
    // native single-pass n-gram expression: the Column form (transform +
    // element_at over filter(split(..))) re-runs the split per element
    // after CollapseProject inlines the array alias — quadratic per doc,
    // measured 12 s vs <1 s at sf0.1 for this exact query
    val grams = df.select(blockCols.map(col) :+
      explode(graft.functions.Expressions.ngrams(col(textCol), n)).as("gram"): _*)
    val counts = grams.groupBy((blockCols :+ "gram").map(col): _*)
      .agg(count(lit(1)).as("occurrences"))
    val order = Seq(col("occurrences").desc, col("gram").asc)
    if (blockCols.isEmpty) {
      // global top-k: orderBy+limit compiles to TakeOrderedAndProject
      // (per-partition heaps, then a k-row merge) — a partitionless window
      // would drag every distinct gram through one task instead
      counts.orderBy(order: _*).limit(k)
        .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
    } else {
      val w = Window.partitionBy(blockCols.map(col): _*).orderBy(order: _*)
      counts.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    }
  }

  /** PMI-ranked collocations: bigrams that co-occur far beyond chance —
    * the phrase-mining signal behind multi-word tokenizer entries
    * ("new york"), stop-phrase induction, and corpus drift reports.
    *   pmi = ln( c(w1,w2) · T / (c_left(w1) · c_right(w2)) )
    * over the corpus bigram table (T = total bigrams; c_left/c_right are
    * positional marginals, so the marginals sum exactly to T and the
    * measure is self-consistent). `minCount` kills the low-frequency
    * noise pairs PMI notoriously over-scores; ranking is on the ROUNDED
    * pmi (6 dp) with a gram tiebreak, so the order is reproducible
    * across engines (raw float ordering would tie-break on ulps).
    *
    * Plan: the bigram explode reduces through three combinable count
    * aggregates (joint + two marginals — each one shuffle of distinct
    * keys); scoring joins are token-equi-keyed; T broadcasts as a 1-row
    * frame; global top-k compiles to TakeOrderedAndProject.
    * Output: (gram, n, pmi, rnk).
    */
  def collocations(df: DataFrame, textCol: String,
                   minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val bg = df.select(explode(graft.functions.Expressions.ngrams(col(textCol), 2)).as("g"))
      .select(split(col("g"), " ").getItem(0).as("w1"),
        split(col("g"), " ").getItem(1).as("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
    val cl = bg.groupBy(col("w1")).agg(count(lit(1)).as("cl"))
    val cr = bg.groupBy(col("w2")).agg(count(lit(1)).as("cr"))
    val t = bg.agg(count(lit(1)).cast("double").as("t"))
    val scored = c12.filter(col("n") >= minCount)
      .join(cl, Seq("w1")).join(cr, Seq("w2"))
      .crossJoin(broadcast(t))
      .select(concat_ws(" ", col("w1"), col("w2")).as("gram"), col("n"),
        // all-double arithmetic: cl·cr as BIGINT would overflow at corpus
        // scale (marginals ~1e13 each at 100 TB), and the oracle must
        // divide the same doubles to land on the same bits
        round(log(col("n").cast("double") * col("t")
          / (col("cl").cast("double") * col("cr").cast("double"))), 6).as("pmi"))
    val order = Seq(col("pmi").desc, col("gram").asc)
    scored.orderBy(order: _*).limit(topK)
      .withColumn("rnk", row_number().over(Window.orderBy(order: _*)))
  }

  /** BPE merge learning (Sennrich et al. 2016; the GPT-2/SentencePiece
    * vocabulary-build core): start from the character alphabet, and
    * `nMerges` times merge the corpus-wide most frequent adjacent symbol
    * pair (count desc, then (left, right) asc — fully deterministic).
    * Returns the merge table (step, left, right, pair_count) — THE
    * artifact a BPE tokenizer ships.
    *
    * Distribution: the corpus collapses to the distinct-WORD frequency
    * table first (a word count — the same reduction as [topNgrams]), so
    * each merge round scans words-×-their-symbols, not the corpus; pair
    * counting is one combinable aggregate per round and the argmax is a
    * driver-side single row (`limit(1)` — bounded by construction). Per
    * round the word table is localCheckpointed: the loop's lineage would
    * otherwise re-run every previous round's replace chain per action.
    * Symbol application uses a space-doubling trick so adjacent
    * occurrences never share a delimiter: `' a b a b '` merges BOTH
    * pairs regardless of either engine's replace-scan order — the
    * property that makes a DuckDB oracle replay bit-identical (qt35).
    * Character splitting is per code point; parity with the RE2-based
    * oracle is exact on the fixture's ASCII tokens (the qt23 caveat).
    */
  def bpeMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1: $nMerges")
    val spark = docs.sparkSession
    var words = docs
      .select(explode(graft.functions.Expressions.ngrams(col(textCol), 1)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("freq"))
      .withColumn("syms", trim(regexp_replace(col("w"), "(.)", "$1 ")))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var dry = false
    while (step <= nMerges && !dry) {
      val s = split(col("syms"), " ")
      val top = words
        // barrier: keeps the size(s) >= 2 filter from re-splitting per
        // reference when pushed below the projection
        .select(col("freq"), graft.functions.Expressions.barrier(s).as("s"))
        // single-symbol words have no pairs — and Spark's sequence(1, 0)
        // would DESCEND through index 0 rather than come back empty
        .filter(size(col("s")) >= 2)
        .select(col("freq"), explode(sequence(lit(1), size(col("s")) - 1)).as("i"),
          col("s"))
        .select(col("freq"), element_at(col("s"), col("i")).as("l"),
          element_at(col("s"), col("i") + 1).as("r"))
        .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, cnt))
        // double every delimiter, pad, replace ' l  r ' → ' lr ', collapse
        val doubled = concat(lit(" "), regexp_replace(col("syms"), " ", "  "), lit(" "))
        val applied = replace(doubled, lit(s" $l  $r "), lit(s" $l$r "))
        words = words
          .withColumn("syms", trim(regexp_replace(applied, " +", " ")))
          .localCheckpoint(true)
        step += 1
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      merges.map { case (st, l, r, c) => org.apache.spark.sql.Row(st, l, r, c) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("step", org.apache.spark.sql.types.IntegerType, false),
        org.apache.spark.sql.types.StructField("left", org.apache.spark.sql.types.StringType, false),
        org.apache.spark.sql.types.StructField("right", org.apache.spark.sql.types.StringType, false),
        org.apache.spark.sql.types.StructField("pair_count", org.apache.spark.sql.types.LongType, false))))
  }

  /** The encode half of [bpeMerges]: apply a learned merge table (in step
    * order) to `docs`, returning per-document BPE token counts alongside
    * the whitespace token count. `merges` is (left, right) in step order —
    * the small, driver-resident artifact a tokenizer ships (collected
    * from [bpeMerges]'s output or loaded from its persisted table).
    *
    * Pure map pass: per token, character split then one folded
    * space-doubling replace per merge — the identical application rule
    * training used, so encoding the training corpus reproduces training's
    * final symbolization — followed by one combinable per-doc count
    * aggregate. No shuffle before the count; 100 TB encodes like a word
    * count.
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(graft.functions.Expressions.ngrams(col(textCol), 1)).as("w"))
    val sym0 = trim(regexp_replace(col("w"), "(.)", "$1 "))
    val symN = merges.foldLeft(sym0) { case (acc, (l, r)) =>
      trim(regexp_replace(
        replace(concat(lit(" "), regexp_replace(acc, " ", "  "), lit(" ")),
          lit(s" $l  $r "), lit(s" $l$r ")),
        " +", " "))
    }
    tok.select(col(idCol), size(split(symN, " ")).cast("long").as("n_sym"))
      .groupBy(col(idCol))
      .agg(sum(col("n_sym")).as("n_bpe_tokens"), count(lit(1)).as("n_ws_tokens"))
  }
}
