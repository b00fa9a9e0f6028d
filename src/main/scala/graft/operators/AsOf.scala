package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) left join: for every left row, attach the latest
  * right row with the same key and rightTime <= leftTime.
  *
  * Implementation is the union+window formulation, not a join: tag both
  * sides, union, sort within key by (time, side, tiebreak) and carry the
  * last right row forward with `last(struct, ignoreNulls = true)`. One
  * shuffle on the key, one in-partition sort — no range explosion, no
  * nested-loop join; skew is bounded by per-key row counts. This is the
  * standard scalable as-of plan (what dedicated engines' ASOF JOIN lowers
  * to). The right row travels as ONE struct, so multi-column payloads stay
  * row-atomic even when individual fields are null.
  *
  * Ties (rightTime == leftTime) match (`<=` semantics); among multiple
  * right rows at the same (key, time), the highest `rightOrder` wins
  * deterministically.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightValues: Seq[String],
               rightOrder: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val rv = struct(rightValues.map(col): _*)
    // side 0 (right) sorts before side 1 (left) at equal times → `<=` holds;
    // null-time right rows are dropped AFTER the cast (an unparseable time
    // string is as unmatchable as a null one — both would sort first and
    // masquerade as earliest matches)
    val taggedRight = right.select(
        col(rightKey).as("__key"),
        col(rightTime).cast("timestamp").as("__time"),
        lit(0).as("__side"),
        rightOrder.map(c => col(c).cast("double")).getOrElse(lit(0.0)).as("__ord"),
        rv.as("__rv"))
      // null KEYS dropped too: Window.partitionBy groups nulls into ONE
      // partition, so a null-key right row would as-of-match every null-key
      // left row — but no equality-semantics ASOF JOIN matches null = null.
      // Null-key left rows stay (their partition then has no right rows →
      // __asof = null, exactly the unmatched result).
      .filter(col("__time").isNotNull && col("__key").isNotNull)
    val rvType = taggedRight.schema("__rv").dataType
    val taggedLeft = left.select(
      Seq(col(leftKey).as("__key"), col(leftTime).cast("timestamp").as("__time"),
        lit(1).as("__side"), lit(0.0).as("__ord"), lit(null).cast(rvType).as("__rv")) ++
        leftCols.map(col): _*)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__time").asc, col("__side").asc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightValues.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
