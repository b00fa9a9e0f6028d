package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch measurement probe (not part of the catalog — deleted before
  * the round ships): per-job wall times of one graph entry run.
  */
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val entry = args.lift(1).getOrElse("q50_pagerank")
    val spark = GraftSession.get()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties.getProperty("spark.job.description"))
          .getOrElse(js.stageInfos.headOption.map(_.name).getOrElse("?"))
        jobs.put(js.jobId, (desc, System.nanoTime()))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (desc, t0) =>
          done.add((je.jobId, desc, (System.nanoTime() - t0) / 1e9))
        }
      }
    })
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        plans.add(f"== action $funcName (${durationNs / 1e9}%.3f s) ==\n" +
          qe.executedPlan.toString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })
    // warmup run (store build + codegen), then the timed run
    SparkEntry.queries(entry)(spark, sfDir).count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    done.clear()
    plans.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(entry)(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    done.asScala.toSeq.sortBy(_._1).foreach { case (id, desc, sec) =>
      println(f"job $id%3d  $sec%6.3f s  ${desc.take(90)}")
    }
    println(f"TOTAL $total%.3f s over ${done.size} jobs")
    val out = args.lift(2).getOrElse("/tmp/tmpprobe_plans.txt")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      plans.asScala.mkString("\n\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"plans -> $out")
    spark.stop()
  }
}
