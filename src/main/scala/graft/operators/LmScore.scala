package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Language-model quality scoring, the CCNet shape (Wenzek et al. 2020):
  * score each document by the perplexity of a language model and threshold
  * or bucket on it. CCNet uses a pre-trained KenLM; here the model is an
  * add-one-smoothed bigram LM trained in-engine on the corpus itself —
  * two map-combinable count aggregates — so the whole signal stays inside
  * the engine with no external model artifact. Low average NLL = typical,
  * fluent text under the corpus distribution; high = gibberish, wrong
  * language, or heavily off-distribution — the same tails CCNet's
  * head/middle/tail split cuts on.
  *
  * Scale shape: the bigram table is one explode; c(w1,w2) and c(w1) are
  * hash aggregates on token keys; vocabulary size is a 1-row frame that
  * broadcasts; scoring joins are all equi-keyed on tokens. The per-doc
  * average folds contributions in explicit position order (array_sort +
  * aggregate) so the float sum is deterministic and oracle-comparable —
  * never an unordered SUM of doubles.
  */
object LmScore {

  /** Per-document average bigram negative log-likelihood under the
    * corpus-trained add-one LM:
    *   p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)
    * with c(w1) the count of w1 as a bigram context and V the corpus
    * vocabulary size. Output: (idCol, n_bigrams, nll) for every input row;
    * documents with fewer than two tokens carry n_bigrams = 0, nll = null.
    */
  def bigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // barrier: the size(ts) >= 2 filter below would otherwise push under
    // this projection with the tokenize subtree substituted (2× tokenize
    // per row); the bigram transform then reads the attribute
    val toks = df.select(col(idCol),
      graft.functions.Expressions.barrier(TextFns.tokens(col(textCol))).as("ts"))
    val bg = toks.filter(size(col("ts")) >= 2)
      .select(col(idCol), posexplode(expr(
        "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i + 1] AS w2))")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("col.w1").as("w1"), col("col.w2").as("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = toks.select(explode(col("ts")).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("v"))
    val contrib = bg
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("c", -log((col("c12") + lit(1.0)) / (col("c1") + col("v"))))
    val perDoc = contrib.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_bigrams"),
      round(
        graft.functions.Expressions.foldSumField(
          array_sort(collect_list(struct(col("pos").as("p"), col("c").as("c")))))
          / count(lit(1)), 6).as("nll"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("nll"))
  }

  /** CCNet's head/middle/tail split over the LM score: rank every scored
    * document by NLL (ascending — head is the most-fluent third) and cut
    * into `nBuckets` rank-tertiles. Rank-based, not value-threshold-based,
    * deliberately: the (nll, id) order is total and integer-split, so the
    * assignment is reproducible bit-for-bit across engines — a float
    * threshold boundary is not. Unscored rows (< 2 tokens) are excluded.
    *
    * The ntile rides ONE global window — fine for reporting output sizes,
    * wrong as a 100 TB per-row pass; [bucketByApproxNll] below is the
    * at-scale assignment path (sketch thresholds, map-side compare).
    * Output: (bucket, n_docs, min_nll, max_nll, avg_nll).
    */
  def nllBuckets(scored: DataFrame, idCol: String, nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("nll").asc, col(idCol).asc)
    val labels: Column = {
      val n = ntile(nBuckets).over(w)
      if (nBuckets == 3)
        when(n === 1, "head").when(n === 2, "middle").otherwise("tail")
      else concat(lit("b"), n.cast("string"))
    }
    scored.filter(col("nll").isNotNull)
      .withColumn("bucket", labels)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("nll")).as("min_nll"), max(col("nll")).as("max_nll"),
        round(avg(col("nll")), 6).as("avg_nll"))
  }

  /** The at-scale sibling of [nllBuckets]: bucket thresholds from an
    * approx-percentile sketch (one aggregate), assignment a map-side
    * comparison — no global window anywhere, so the per-row pass scales
    * flat. Boundaries are approximate (sketch accuracy 1e-4 relative
    * rank); use the exact variant only for report-sized outputs.
    * Output: `scored` plus a `bucket` column.
    */
  def bucketByApproxNll(scored: DataFrame, nBuckets: Int = 3,
                        accuracy: Int = 10000): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = scored.filter(col("nll").isNotNull)
      .select(percentile_approx(col("nll"),
        array(ps.map(lit): _*), lit(accuracy)).as("cuts"))
    val withCuts = scored.crossJoin(broadcast(cuts))
    val names: Int => String =
      if (nBuckets == 3) Map(1 -> "head", 2 -> "middle", 3 -> "tail")
      else (i: Int) => s"b$i"
    val bucket = (1 until nBuckets).foldLeft(Option.empty[Column]) {
      case (acc, i) =>
        val c = col("nll") <= element_at(col("cuts"), i)
        Some(acc.fold(when(c, lit(names(1))))(_.when(c, lit(names(i)))))
    }.get.otherwise(lit(names(nBuckets)))
    withCuts
      .withColumn("bucket", when(col("nll").isNull, lit(null)).otherwise(bucket))
      .drop("cuts")
  }
}
