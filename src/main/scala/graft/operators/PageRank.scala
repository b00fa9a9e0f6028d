package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank (Page et al. 1999) as pure DataFrame joins —
  * the canonical iterative-graph workload a corpus engine needs for
  * link-based quality signals (e.g. harvesting a crawl's link graph for
  * per-domain authority, the Common Crawl ranking recipe).
  *
  * Per iteration: every node sends rank/outdegree along its out-edges
  * (edge join on src — equi-key), inflow is summed per destination
  * (groupBy dst — the one shuffle), dangling mass (rank parked on nodes
  * with no out-edges) redistributes uniformly, and
  *
  *   rank' = (1−d)/N + d·(inflow + dangling/N)
  *
  * Lineage is truncated with an eager `localCheckpoint` per iteration
  * (same discipline as the connected-components operator) so the plan
  * doesn't grow with the iteration count. The node count N collects one
  * scalar to the driver — bounded by construction.
  *
  * `oracleMode` folds each per-node inflow sorted by source, and the
  * dangling mass sorted by node, so every intermediate double is
  * bit-identical across partitionings and engines (the IVF oracle-mode
  * discipline); production mode uses plain combinable `sum` — last-ulp
  * nondeterminism no ranking consumer cares about, at a fraction of the
  * cost. Ranks are rounded at 6 only on the final output.
  */
object PageRank {

  private def sortedFold(key: org.apache.spark.sql.Column,
                         value: org.apache.spark.sql.Column) =
    aggregate(
      transform(array_sort(collect_list(struct(key.as("k"), value.as("v")))),
        x => x.getField("v")),
      lit(0.0), (acc, v) => acc + v)

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               oracleMode: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(damping > 0.0 && damping < 1.0, s"damping out of (0,1): $damping")
    // eager checkpoint: every iteration (and the degree/node derivations)
    // re-reads the edge list — without this, an edge frame that is itself
    // a join gets recomputed iters+2 times
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg")).localCheckpoint()
    var rank = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(rank.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), col("src"), (col("rank") / col("odeg")).as("c"))
      val inflow = contribs.groupBy(col("node")).agg(
        (if (oracleMode) sortedFold(col("src"), col("c")) else sum(col("c")))
          .as("inflow"))
      val dangling = rank.join(outdeg.withColumnRenamed("src", "node"),
        Seq("node"), "left_anti")
      val dmass = dangling.agg(
        (if (oracleMode) sortedFold(col("node"), col("rank"))
         else coalesce(sum(col("rank")), lit(0.0))).as("dmass"))
      rank = nodes.join(inflow, Seq("node"), "left")
        .crossJoin(broadcast(dmass))
        .withColumn("rank",
          lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("inflow"), lit(0.0)) + col("dmass") / lit(n.toDouble)))
        .select(col("node"), col("rank"))
        .localCheckpoint()
    }
    rank.withColumn("rank", round(col("rank"), 6))
  }
}
