package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (left) side into `salt` sub-keys
  * and replicate the right side once per salt value, so one hot key spreads
  * over `salt` shuffle partitions instead of one straggler task.
  *
  * Result is row-identical to `left.join(right, keys)` (inner). The salt
  * hashes the left row's content — fully DETERMINISTIC, so shuffle-retry
  * recomputation assigns the same salt to the same row (a nondeterministic
  * salt such as rand() or a row ordinal risks SPARK-23207-style row
  * loss/duplication under partial stage retries). Caveat: byte-identical
  * duplicate rows share a salt and still co-locate; pass `discriminator`
  * (a stable row-id column, e.g. a source offset) to spread them too.
  * AQE's skew-join handles moderate skew automatically; explicit salting is
  * for the pathological keys AQE can't split (e.g. one key = 30% of 100 TB).
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String], salt: Int,
                 discriminator: Option[String] = None): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val hashCols = discriminator.map(c => Seq(col(c))).getOrElse(left.columns.toSeq.map(col))
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(hashCols: _*), lit(salt)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salt).map(lit(_)): _*)))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }
}
