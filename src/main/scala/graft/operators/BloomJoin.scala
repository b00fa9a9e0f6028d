package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the classic 100 TB shuffle saver:
  * when a big fact table joins a selective dimension, most fact rows
  * don't survive the join, yet a plain shuffle join ships ALL of them.
  * Building a Bloom filter over the dimension's keys and filtering the
  * fact side BEFORE the shuffle drops the non-matching rows at the scan,
  * at the cost of a fixed-size bitset broadcast. (Spark's own runtime
  * row-level filtering does this for some shapes; this operator makes it
  * explicit, tunable, and available where the planner won't inject it.)
  *
  * No false negatives — the pruned join returns EXACTLY the plain join's
  * rows (oracled as q45 against the un-pruned SQL join); false positives
  * only cost shuffle bytes, bounded by `fpp`.
  */
object BloomJoin {

  /** Inner-joins `big` with `small` on `keys`, Bloom-pruning the big side
    * first. `expectedKeys` sizes the filter (default: count the small
    * side — one cheap aggregate over the SMALL table).
    *
    * The filter is built with `DataFrameStatFunctions.bloomFilter` (a
    * distributed aggregate producing one fixed-size sketch on the driver
    * — kilobytes to a few MB for fpp 1%, independent of the BIG side) and
    * shipped back as a broadcast variable probed inside a predicate —
    * the same build/probe dataflow a runtime bloom join uses.
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                      fpp: Double = 0.01,
                      expectedKeys: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val spark = big.sparkSession
    // composite keys probe as their unit-separated (0x1F) concat-ws form;
    // the separator never appears in numeric/identifier keys. concat_ws
    // SKIPS null components, so ("a", null) and ("a") probe alike — a
    // false-POSITIVE source only (the join re-checks keys exactly), never
    // a correctness issue
    def keyExpr(df: DataFrame): Column =
      if (keys.length == 1) col(keys.head).cast("string")
      else concat_ws("", keys.map(k => col(k).cast("string")): _*)
    val n = expectedKeys.getOrElse(
      math.max(1L, small.select(keys.map(col): _*).distinct().count()))
    val bloom = small.select(keyExpr(small).as("__k")).filter(col("__k").isNotNull)
      .stat.bloomFilter("__k", n, fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: String) => k != null && bloomBc.value.mightContainString(k))
    big.filter(mightContain(keyExpr(big))).join(small, keys)
  }
}
