package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: every row's
  * split assignment is a pure function of its key (and an optional seed
  * string), so the same row lands in the same split on every run, on every
  * cluster, regardless of partitioning, row order, or executor count —
  * unlike `DataFrame.randomSplit`, whose assignment depends on partition
  * layout and so silently reshuffles examples between train and test when
  * the input is repartitioned (the classic train/test-leak foot-gun at
  * scale).
  *
  * The hash is `md5(key || seed)` truncated to 48 bits and scaled to a
  * uniform fraction in [0, 1): md5 because every engine has it (the
  * assignment is reproducible OUTSIDE Spark — the DuckDB oracle re-derives
  * it in SQL), 48 bits because that fits both a BIGINT and an exact double.
  * All column ops — codegen'd, no UDF, no shuffle: splitting 100 TB is a
  * narrow map over the scan.
  */
object Split {

  /** Uniform [0, 1) fraction from the row key: the first 12 hex chars of
    * `md5(key || seed)` read as an integer, divided by 16^12. Keys are cast
    * to string first, so any key type works; composite keys should be
    * `concat_ws`-ed by the caller with a separator that cannot alias
    * (e.g. `concat_ws("|", k1, k2)`). A NULL key yields a NULL fraction:
    * [assignSplit] routes all null-key rows to the LAST split and
    * [sampleByHash] drops them — coalesce the key upstream if null keys
    * should participate.
    */
  def hashFraction(key: Column, seed: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(seed))), 1, 12), 16, 10)
      .cast("long").cast("double") / lit(281474976710656.0 /* 16^12 = 2^48 */)

  /** Assigns each row a split label from `splits` (name → weight; weights
    * are normalized, so (8, 1, 1) and (0.8, 0.1, 0.1) are the same), as a
    * new column `splitCol`. Assignment is by cumulative-weight interval
    * over [hashFraction]: label i covers [cum_{i-1}, cum_i), so growing one
    * split's weight only MOVES the boundary — rows never swap between two
    * splits whose boundary didn't move (stable under re-weighting, the
    * property production pipelines rely on when growing eval sets).
    */
  def assignSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)],
                  seed: String = "", splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 > 0), s"split weights must be positive: $splits")
    val total = splits.map(_._2).sum
    val cums = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val u = hashFraction(key, seed)
    // last split takes the open top of the interval — no row can fall out
    val expr = splits.init.zip(cums.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cum)) =>
        val c = u < lit(cum)
        Some(acc.fold(when(c, lit(name)))(_.when(c, lit(name))))
    }.fold(lit(splits.last._1))(_.otherwise(lit(splits.last._1)))
    df.withColumn(splitCol, expr)
  }

  /** Deterministic Bernoulli sample: keeps the rows whose [hashFraction]
    * falls below `fraction`. Same stability story as [assignSplit]; also
    * MONOTONE in `fraction` — sample(0.1) ⊆ sample(0.2) for the same seed,
    * so growing a data audit's sample only adds rows.
    */
  def sampleByHash(df: DataFrame, key: Column, fraction: Double,
                   seed: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    df.filter(hashFraction(key, seed) < lit(fraction))
  }
}
