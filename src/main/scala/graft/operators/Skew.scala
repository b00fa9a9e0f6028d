package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (left) side into `salt` sub-keys
  * and replicate the right side once per salt value, so one hot key spreads
  * over `salt` shuffle partitions instead of one straggler task.
  *
  * Result is row-identical to `left.join(right, keys)` (inner). The salt
  * mixes the row's content hash with a per-row ordinal, so even byte-
  * identical duplicate rows of one hot key (the classic replayed-events
  * pathology) spread across all salt buckets. Any salt assignment yields
  * the same join RESULT (the right side is replicated to every salt), so
  * the ordinal's partition-layout dependence doesn't affect correctness.
  * AQE's skew-join handles moderate skew automatically; explicit salting is
  * for the pathological keys AQE can't split (e.g. one key = 30% of 100 TB).
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col) :+ monotonically_increasing_id(): _*),
        lit(salt)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salt).map(lit(_)): _*)))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }
}
