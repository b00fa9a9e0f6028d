package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Within-document repetition signals for corpus quality filtering — the
  * Gopher-style repetition family (Rae et al. 2021, "Scaling Language
  * Models", table A1): heavily self-repeating documents (boilerplate,
  * scraped navigation, generation loops) are the single highest-yield
  * removal class in web-corpus curation.
  *
  * Per document: duplicate-line fraction (how many line occurrences are
  * repeats), duplicate-line CHARACTER fraction (how much text you'd delete
  * dropping the repeats — catches one long line pasted twice among many
  * short ones), and top-bigram fraction (share of token bigram occurrences
  * claimed by the single most frequent bigram — catches "foo bar foo bar
  * foo bar" loops that line-level signals miss).
  *
  * Plan shape: two explode → aggregate chains, each shuffling on
  * (doc, line) / (doc, bigram) then (doc) — all map-side-combinable
  * hash aggregates keyed by the document, so 100 TB scales linearly with
  * no cross-document traffic; the final assembly is a doc-key join of two
  * doc-key'd frames (co-partitioned, AQE-merged).
  */
object Repetition {

  /** Per-doc signals: `n_lines`, `dup_line_frac`, `dup_line_char_frac`,
    * `top_bigram_frac`. Documents with no non-empty lines / fewer than two
    * tokens score 0.0 on the respective signals (nothing is repeated).
    * Fractions are exact ratios of integer counts — no rounding, so they
    * hash-compare bit-identically across engines.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)

    // line stats: trim, drop empties, count occurrences per distinct line
    val lines = df.select(id, explode(
        filter(transform(split(col(textCol), "\n"), l => trim(l)), l => l =!= ""))
        .as("line"))
      .groupBy(id, col("line"))
      .agg(count(lit(1)).as("cnt"), max(length(col("line"))).cast("long").as("len"))
    val lineStats = lines.groupBy(id).agg(
      sum(col("cnt")).as("n_lines"),
      (sum(col("cnt") - 1).cast("double") / sum(col("cnt"))).as("dup_line_frac"),
      (sum((col("cnt") - 1) * col("len")).cast("double") /
        sum(col("cnt") * col("len"))).as("dup_line_char_frac"))

    // token-bigram stats: ALL occurrences (not the distinct shingle set),
    // via the native single-pass n-gram expression (the Column form is
    // quadratic per doc — see Vocab.topNgrams)
    val bigrams = df
      .select(id, explode(graft.functions.Expressions.ngrams(col(textCol), 2)).as("bg"))
      .groupBy(id, col("bg")).agg(count(lit(1)).as("cnt"))
    val bigramStats = bigrams.groupBy(id).agg(
      (max(col("cnt")).cast("double") / sum(col("cnt"))).as("top_bigram_frac"))

    df.select(id)
      .join(lineStats, Seq(idCol), "left")
      .join(bigramStats, Seq(idCol), "left")
      .select(id,
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("dup_line_frac"), lit(0.0)).as("dup_line_frac"),
        coalesce(col("dup_line_char_frac"), lit(0.0)).as("dup_line_char_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"))
  }
}
