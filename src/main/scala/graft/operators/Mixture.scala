package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-corpus mixture: combine sources with per-source sampling
  * weights, the way LLM data recipes specify "2.5 epochs of wikipedia,
  * 0.3 of common crawl". A weight w contributes floor(w) full copies of
  * the source (tagged `mix_epoch` 0..floor(w)-1) plus a deterministic
  * hash-sample of the remaining w - floor(w) fraction as the final
  * partial epoch — so the OUTPUT is exactly w× the source in expectation,
  * and exactly reproducible row-for-row (same [Split.hashFraction]
  * machinery as the split operator: stable under repartitioning, cluster
  * size, and run count).
  *
  * The fractional epoch keeps the LOWEST hash fractions, so partial
  * epochs are nested: raising a weight from 2.3 to 2.6 keeps every row
  * the 2.3 mix had and adds rows — recipes can be tuned without churning
  * the previously selected data.
  *
  * Plan shape: per source, a copy-explode (narrow; floor(w)+1 output rows
  * per input row max) and a filter — no shuffle at all; the union is
  * plan-level. Mixing 100 TB is a map.
  */
object Mixture {

  /** `sources`: (name, df, weight ≥ 0). All inputs must share a schema.
    * Output: the input columns plus `mix_source` (the name) and
    * `mix_epoch` (0-based copy index; the highest epoch per source is the
    * partial one when the weight is fractional). `key` extracts the
    * stable per-row identity used for the fractional-epoch hash sample.
    */
  def mixCorpora(sources: Seq[(String, DataFrame, Double)], key: Column): DataFrame = {
    require(sources.nonEmpty, "at least one source required")
    require(sources.forall(_._3 >= 0), s"weights must be non-negative")
    val active = sources.filter(_._3 > 0)
    require(active.nonEmpty, "all weights are zero — empty mixture")
    active.map { case (name, df, weight) =>
      val full = math.floor(weight).toLong
      val frac = weight - full
      // epochs 0..full-1 are complete copies; epoch `full` keeps the rows
      // whose hash fraction falls under the fractional remainder (seeded
      // by source name so co-keyed sources sample independently)
      df.withColumn("mix_epoch",
          explode(sequence(lit(0L), lit(if (frac > 0) full else full - 1))))
        .filter(col("mix_epoch") < full ||
          Split.hashFraction(key, seed = name) < lit(frac))
        .withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Per-source document quota (the C4/RefinedWeb-style domain-balancing
    * step): keep at most `quota` documents per `sourceCol` value, best
    * first by `rankBy` (descending; `idCol` ascending breaks ties
    * deterministically).
    *
    * `preBuckets` is the skew valve. 0 = one rank window per source —
    * fine when no single source dwarfs a task. At 100 TB the heavy-hitter
    * domain IS the skewed key, and one task would sort it alone; with
    * preBuckets = b > 0 a first window ranks within (source,
    * content-hash-bucket) and keeps `quota` per bucket, bounding the
    * final per-source window to b·quota rows regardless of source size.
    * Output-identical to the plain path by construction: a row outside
    * its bucket's top-quota is outranked by quota rows of its own source
    * and can never be in the source's global top-quota. The bucket hash
    * keys on (rank value, id) — the DETERMINISTIC row identity the final
    * ordering also uses — never on ordinals (SPARK-23207).
    */
  def sourceQuota(docs: DataFrame, sourceCol: String, idCol: String,
                  quota: Int, rankBy: Column,
                  preBuckets: Int = 0): DataFrame = {
    require(quota >= 1, s"quota must be >= 1: $quota")
    import org.apache.spark.sql.expressions.Window
    val pruned = if (preBuckets <= 0) docs else {
      val bw = Window
        .partitionBy(col(sourceCol),
          pmod(xxhash64(rankBy, col(idCol)), lit(preBuckets)))
        .orderBy(rankBy.desc, col(idCol).asc)
      docs.withColumn("__pr", row_number().over(bw))
        .filter(col("__pr") <= quota).drop("__pr")
    }
    val w = Window.partitionBy(col(sourceCol)).orderBy(rankBy.desc, col(idCol).asc)
    pruned.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= quota).drop("__r")
  }
}
