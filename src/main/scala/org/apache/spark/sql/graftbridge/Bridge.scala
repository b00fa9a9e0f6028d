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
    import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, SortOrder}
    import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection, UnknownPartitioning}
    import org.apache.spark.sql.execution.LogicalRDD
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val qe = ds.queryExecution
    // toRdd FIRST: executing the AdaptiveSparkPlanExec finalizes it, so the
    // partitioning/ordering read below describe the plan that actually
    // produced the RDD's rows
    val rdd = qe.toRdd
    // `LogicalRDD.fromDataset` reads executedPlan.outputPartitioning — but
    // under AQE executedPlan IS the AdaptiveSparkPlanExec wrapper, which
    // does not override outputPartitioning (SparkPlan's default:
    // UnknownPartitioning). Every cut view therefore silently reported
    // Unknown and downstream joins re-inserted exchanges whenever the
    // planner chose a sort-merge join (the 100 TB regime; fixture-scale
    // plans hid it behind broadcasts — found in r17's broadcast-off CC
    // probe). Read the FINALIZED inner plan instead and rewrite its
    // partitioning/ordering onto the view's output attributes, falling
    // back to Unknown when any referenced attribute does not survive
    // into the output.
    val inner = qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // An alias-aware projection on top (e.g. `id AS component`) reports a
    // PartitioningCollection with the alias variant possibly FIRST — keep
    // every member that survives the attribute rewrite, not just the
    // head, or the join-key variant is silently dropped.
    def flatten(p: Partitioning): Seq[Partitioning] = p match {
      case c: PartitioningCollection => c.partitionings.flatMap(flatten)
      case other => Seq(other)
    }
    val assoc: Map[Attribute, Attribute] =
      LogicalRDD.buildOutputAssocForRewrite(inner.output, ds.logicalPlan.output)
        .getOrElse(Map.empty)
    def rewritable(e: Expression): Boolean =
      e.references.forall(a => assoc.contains(a))
    def rewrite[E <: Expression](e: E): E =
      e.transform { case a: Attribute => assoc(a) }.asInstanceOf[E]
    val partitioning: Partitioning = {
      val kept = flatten(inner.outputPartitioning).flatMap {
        case u: UnknownPartitioning => Some(u)
        case e: Expression with Partitioning =>
          if (rewritable(e)) Some(rewrite(e).asInstanceOf[Partitioning]) else None
        case attrFree => Some(attrFree) // SinglePartition / round-robin
      }
      kept match {
        case Seq() => UnknownPartitioning(0)
        case Seq(one) => one
        case many => PartitioningCollection(many)
      }
    }
    val ordering: Seq[SortOrder] = {
      val o = inner.outputOrdering
      if (o.nonEmpty && o.forall(rewritable)) o.map(rewrite(_)) else Nil
    }
    val (stats, constraints) =
      LogicalRDD.rewriteStatsAndConstraints(ds.logicalPlan, qe.optimizedPlan)
    org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession,
      LogicalRDD(ds.logicalPlan.output, rdd, partitioning, ordering.toSeq,
        isStreaming = false)(ds.sparkSession, stats, constraints))
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
