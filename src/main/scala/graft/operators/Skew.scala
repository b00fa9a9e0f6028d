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
    // hash/xxhash64 rejects MapType (SPARK-27619) — exclude map-bearing
    // columns from the default salt input so the documented "drop-in for
    // left.join(right, keys)" claim holds for frames with map columns;
    // the remaining columns still spread same-key rows (and the
    // discriminator stays the full-duplicate escape hatch)
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = discriminator.map(c => Seq(col(c))).getOrElse {
      val cols = left.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name)).toSeq
      require(cols.nonEmpty, "no hashable columns for the salt — pass a discriminator")
      cols
    }
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(hashCols: _*), lit(salt)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salt).map(lit(_)): _*)))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }
}
