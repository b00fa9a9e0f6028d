package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension type 2 builder (Kimball's dimensional
  * modeling): collapse a keyed change stream into validity intervals —
  * one row per (key, attribute-state) run, `valid_from`/`valid_to`
  * half-open, `is_current` on the last run. The standard way to make a
  * mutable dimension joinable as-of any point in time (the lookup side
  * is exactly [AsOf.asofJoin] on `valid_from`).
  *
  * Semantics: within each key ordered by (ts, tiebreak), a new interval
  * starts where any tracked attribute differs null-safely from the
  * previous row's (consecutive duplicates collapse into one run);
  * `valid_to` is the next run's start (exclusive), NULL while current.
  *
  * Plan shape: two windows over the same (key × ts) ordering — Catalyst
  * plans ONE shuffle on the key columns and sorts once; the second
  * window (lead over the collapsed runs) rides the same partitioning.
  * No self-joins, no driver state — scales to any dimension width.
  */
object Scd2 {

  def buildScd2(updates: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
                tsCol: String, tieBreak: Seq[Column] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keyCols/attrCols must be non-empty")
    val ord: Seq[Column] = col(tsCol).asc +: tieBreak
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val attrs = struct(attrCols.map(col): _*)
    val changed = updates
      .withColumn("__prev", lag(attrs, 1).over(w))
      // null-safe: a NULL attribute is a state too; first row always opens
      .filter(col("__prev").isNull || !(col("__prev") <=> attrs))
      .drop("__prev")
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols.map(col) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }
}
