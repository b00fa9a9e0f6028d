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

  /** Eagerly CONVERT a Column's node tree to a catalyst Expression
    * (UnresolvedFunction-containing, analyzer-resolvable) — unlike
    * [expression], whose lazy ColumnNodeExpression wrapper is only
    * unwrapped by the classic Dataset API paths and reaches codegen
    * unconverted when returned from an injected SQL FunctionBuilder.
    */
  def converted(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
