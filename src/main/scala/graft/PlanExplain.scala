package graft

/** Dumps `.explain("formatted")` of catalog entries to files — the
  * optimization-round evidence artifact (plans/r16/<entry>_<tag>.txt).
  *
  *   sbt -batch "runMain graft.PlanExplain <outDir> <tag> <sfDir> q50_pagerank,qc02_curation_delta"
  *
  * Plans are captured AFTER materialization (collect), so AQE has
  * re-planned (isFinalPlan=true) and iterative entries show their final
  * executed shape; entries whose result frame is checkpoint-truncated
  * (the iterative family) additionally record the LAST materialized
  * intermediate plan where the operator exposes one.
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    // the shared driver builder, NOT re-declared config literals: if the
    // bench session's config drifts, the dumped plans must drift with it
    // or the evidence silently stops matching what the benchmarks execute
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // AQE finalizes in place
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val executed = df.queryExecution.executedPlan.toString
      val txt = s"== ${name} ($tag, $sfDir) ==\n\n" +
        "---- explain(\"formatted\") ----\n" + formatted +
        "\n---- executedPlan (AQE final) ----\n" + executed + "\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[planexplain] wrote $name")
      // the iterative entries' result plan is checkpoint-truncated; drop
      // cache state between entries so plans don't cross-contaminate
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
