package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus audit analytics — the report tables every curation pipeline
  * materializes alongside its data (what shipped, from where, how good),
  * and the rank-based global filters derived from them.
  */
object Report {

  /** Per-(source, lang) corpus report: document count, total tokens,
    * mean quality, and the EXACT median document length (lower-median:
    * the floor((n+1)/2)-th order statistic — deterministic and
    * SQL-re-derivable, unlike approximate percentile sketches whose
    * merge order varies). One word-count-shaped aggregation plus one
    * rank window per group for the median — both shuffle a single row
    * per (source, lang) beyond the median pick.
    */
  def corpusReport(docs: DataFrame, sourceCol: String, langCol: String,
                   textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fns = graft.functions.TextFns
    val base = docs.select(col(sourceCol), col(langCol),
      fns.tokenCount(col(textCol)).cast("long").as("__tok"),
      fns.qualityScore(col(textCol)).as("__q"),
      length(col(textCol)).cast("long").as("__len"))
    val w = Window.partitionBy(col(sourceCol), col(langCol))
      .orderBy(col("__len").asc, col("__tok").asc)
    val ranked = base
      .withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col(sourceCol), col(langCol))))
    ranked.groupBy(col(sourceCol), col(langCol))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("__tok")).cast("long").as("n_tokens"),
        round(avg(col("__q")), 6).as("mean_quality"),
        // lower median = the row ranked floor((n+1)/2) in the length order
        max(when(col("__r") === floor((col("__n") + 1) / 2), col("__len")))
          .cast("long").as("median_len"))
  }

  /** Keep the top `fraction` of documents per block by `rankBy`
    * (descending, `idCol` ascending tiebreak) — the rank-based global
    * quality cut ("keep the best 60% per language") that a fixed
    * threshold can't express when score distributions differ per block.
    * EXACT by construction: ceil(fraction·n) survivors per block via one
    * rank window + one count window over the same partitioning (one
    * shuffle total). For the 100 TB heavy-hitter-block case, the same
    * two-phase pre-prune as [Mixture.sourceQuota] applies when the kept
    * fraction is small; at fraction ≥ ~0.5 pre-pruning cannot shrink the
    * input and the single window is the right plan.
    */
  def topFractionBy(docs: DataFrame, blockCols: Seq[String], idCol: String,
                    fraction: Double, rankBy: Column): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction must be in (0, 1]: $fraction")
    import org.apache.spark.sql.expressions.Window
    val part = Window.partitionBy(blockCols.map(col): _*)
    val w = part.orderBy(rankBy.desc, col(idCol).asc)
    docs.withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(part))
      .filter(col("__r") <= ceil(lit(fraction) * col("__n")))
      .drop("__r", "__n")
  }
}
