package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (ExpressionUtils in columnNodeSupport.scala); extension
  * libraries conventionally reach them from a package under
  * org.apache.spark.sql. This is the only graft code inside Spark's
  * namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Cut a DataFrame's LOGICAL lineage without materializing anything:
    * the returned frame's plan is a flat LogicalRDD over the input's
    * physical execution RDD — the `Dataset.checkpoint` plan shape
    * (partitioning/ordering/stats carried over via
    * `LogicalRDD.fromDataset`) minus the RDD materialization. Executing
    * the new frame runs the original physical plan, which reads the
    * original's cache while it is persisted and recomputes through RDD
    * lineage after an unpersist — correctness is unchanged either way.
    *
    * Why it exists: in a composed pipeline where stage N's frame
    * references stage N−1's two or more times (anti-joins, pair
    * generation), the LOGICAL tree grows geometrically with stage depth
    * even though caches deduplicate execution — and the analyzer/
    * optimizer walk the full tree on EVERY downstream action. Storage
    * mode never pays this (a parquet re-read is a flat scan); this is
    * the cache-mode equivalent, applied at materialization boundaries
    * only (the frame must already be persisted + counted, or the flat
    * plan would re-execute the unpersisted chain per action).
    */
  def cutLineage(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        ds.queryExecution.toRdd, ds, isStreaming = false))
  }

  /** Eagerly CONVERT a Column's node tree to a catalyst Expression
    * (UnresolvedFunction-containing, analyzer-resolvable) — unlike
    * [expression], whose lazy ColumnNodeExpression wrapper is only
    * unwrapped by the classic Dataset API paths and reaches codegen
    * unconverted when returned from an injected SQL FunctionBuilder.
    */
  def converted(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
