package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.streaming.Streams.{Event, SessionOut}
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("windowedCounts aggregates a bounded stream like the batch twin") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0))
    val q = Streams.windowedCounts(input.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("wc").orderBy("window_start")
        .select("event_type", "n", "total_value").as[(String, Long, Double)].collect().toSeq
      assert(got === Seq(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("anomalyStream flags a spike window against batch-trained moments") {
    implicit val sq = spark.sqlContext
    // history: 4 quiet hours of 2 clicks each + one 6-click hour →
    // mean 2.8, a 10-click live window z-scores far above 2
    val history = (0 until 4).flatMap(h =>
      Seq(Event(h * 10L, ts(h * 60), 1, "click", 1.0),
        Event(h * 10L + 1, ts(h * 60 + 5), 2, "click", 1.0))) ++
      (0 until 6).map(i => Event(100L + i, ts(4 * 60 + i), 3, "click", 1.0))
    val stats = Streams.anomalyStats(history.toDF())
    val input = MemoryStream[Event]
    input.addData((0 until 10).map(i =>
      Event(200L + i, ts(10 * 60 + i), 4, "click", 1.0)): _*)
    input.addData(Event(300L, ts(11 * 60), 5, "click", 1.0)) // quiet window
    val q = Streams.anomalyStream(input.toDF(), stats, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("anom").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("anom").orderBy("window_start")
        .select("n", "is_anomaly").as[(Long, Boolean)].collect().toSeq
      assert(got === Seq((10L, true), (1L, false)))
      // z agrees with the batch formula on the same moments
      val z = spark.table("anom").orderBy("window_start")
        .select("z").as[Double].head()
      val (cnt, sn, sn2) = stats.select("cnt", "sn", "sn2").as[(Long, Long, Long)].head()
      val mean = sn.toDouble / cnt
      val sd = math.sqrt(sn2.toDouble / cnt - mean * mean)
      assert(math.abs(z - (10 - mean) / sd) < 1e-5)
    } finally q.stop()
  }

  test("anomalyStream append mode emits ONLY windows finalized by the watermark") {
    implicit val sq = spark.sqlContext
    // the production shape the docstring describes: watermarked window agg
    // then stream-static broadcast join, append output — a window is
    // emitted once (completed), never restated
    val history = (0 until 4).flatMap(h =>
      Seq(Event(h * 10L, ts(h * 60), 1, "click", 1.0),
        Event(h * 10L + 1, ts(h * 60 + 5), 2, "click", 1.0))) ++
      (0 until 6).map(i => Event(100L + i, ts(4 * 60 + i), 3, "click", 1.0))
    val stats = Streams.anomalyStats(history.toDF())
    val input = MemoryStream[Event]
    val q = Streams.anomalyStream(input.toDF(), stats, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("anomA").outputMode("append").start()
    try {
      input.addData((0 until 10).map(i =>
        Event(200L + i, ts(10 * 60 + i), 4, "click", 1.0)): _*)
      q.processAllAvailable()
      // spike window [10:00, 11:00) is still open — append withholds it
      assert(spark.table("anomA").isEmpty)
      // an event at 11:30 moves the watermark to 11:20, past the window end
      input.addData(Event(300L, ts(11 * 60 + 30), 5, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("anomA")
        .select("n", "is_anomaly").as[(Long, Boolean)].collect().toSeq
      assert(got === Seq((10L, true))) // finalized spike only; 11:00 window still open
    } finally q.stop()
  }

  test("sessionize splits on gaps > 30 min and matches batch semantics") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "a", 1.0),
      Event(2, ts(10), 1, "a", 2.0),
      Event(3, ts(50), 1, "a", 4.0), // gap 40 min → new session, emits first
      Event(4, ts(0), 2, "b", 8.0))
    val q = Streams.sessionize(input.toDS(), gapSeconds = 1800, useTimeout = false)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sess").as[SessionOut].collect()
      // only user 1's first session is emitted (second is still open in state)
      assert(got.toSeq === Seq(SessionOut(1L, ts(0), ts(10), 2L, 3.0)))
    } finally q.stop()
  }

  test("sessionFn late events: within-gap extends start backward; deep-late emits its own session") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    def openState(startMin: Int, lastMin: Int) = TestGroupState.create[Streams.SessionState](
      optionalState = Optional.of(Streams.SessionState(ts(startMin).getTime, ts(lastMin).getTime, 2L, 3.0)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = ts(60).getTime,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = false)
    // within-gap late event (5 min before start, gap 30 min): merges AND
    // moves session_start back — matching the batch sort's min event time
    val s1 = openState(10, 20)
    val out1 = Streams.sessionFn(1800 * 1000, useTimeout = false)(
      1L, Iterator(Event(9, ts(5), 1, "a", 1.0)), s1).toSeq
    assert(out1.isEmpty && s1.get.start === ts(5).getTime && s1.get.n === 3)
    // deep-late event (a full gap earlier): its own closed singleton, the
    // open session untouched
    val s2 = openState(50, 55)
    val out2 = Streams.sessionFn(1800 * 1000, useTimeout = false)(
      1L, Iterator(Event(9, ts(2), 1, "a", 7.0)), s2).toSeq
    assert(out2 === Seq(SessionOut(1L, ts(2), ts(2), 1L, 7.0)))
    assert(s2.get.start === ts(50).getTime && s2.get.n === 2)
  }

  test("sessionFn timeout branch closes and clears the open session") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val state = TestGroupState.create[Streams.SessionState](
      optionalState = Optional.of(Streams.SessionState(ts(0).getTime, ts(10).getTime, 2L, 3.0)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = ts(60).getTime,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = true)
    val out = Streams.sessionFn(1800 * 1000, useTimeout = true)(1L, Iterator.empty, state).toSeq
    assert(out === Seq(SessionOut(1L, ts(0), ts(10), 2L, 3.0)))
    assert(state.isRemoved)
  }

  test("upsertSink maintains a keyed snapshot across micro-batches") {
    implicit val sq = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_upsink").toString + "/state"
    val input = MemoryStream[Event]
    val q = input.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        Streams.upsertSink(b, id, path, Seq("user_id")))
      .start()
    try {
      input.addData(Event(1, ts(0), 1, "a", 1.0), Event(2, ts(1), 2, "b", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(2), 1, "a2", 9.0)) // same key 1 → replaces
      q.processAllAvailable()
      val state = spark.read.parquet(path)
        .select("user_id", "event_id").as[(Long, Long)].collect().toMap
      assert(state === Map(1L -> 3L, 2L -> 2L))
      // no stale swap artifacts after a clean batch
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "_next")))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "_old")))
    } finally q.stop()
  }

  test("upsertSink recovers a mid-swap crash: committed _next, missing target") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsink_rec").toString
    val path = dir + "/state"
    // simulate the crash window: previous batch wrote + committed _next,
    // retired the old target, died before the final rename
    Seq((1L, "stale")).toDF("user_id", "v").write.parquet(path + "_next")
    val batch = Seq((2L, "fresh")).toDF("user_id", "v")
    Streams.upsertSink(batch, 0L, path, Seq("user_id"))
    val state = spark.read.parquet(path).as[(Long, String)].collect().toMap
    // the recovered _next snapshot was the base; the new batch merged in
    assert(state === Map(1L -> "stale", 2L -> "fresh"))
  }

  test("file-source stream over parquet matches the batch aggregation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val batch = graft.sources.Tables.events(spark, sf)
      .select($"ts", $"event_type", $"value", $"user_id").limit(2000)
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = Streams.windowedCounts(stream, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("fc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("fc")
        .select($"window_start", $"event_type", $"n").as[(java.sql.Timestamp, String, Long)]
        .collect().toSet
      val expected = spark.read.parquet(dir)
        .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour"), $"event_type")
        .count()
        .select($"window.start", $"event_type", $"count").as[(java.sql.Timestamp, String, Long)]
        .collect().toSet
      assert(streamed === expected)
    } finally q.stop()
  }

  test("curateStream: scrub + gates + exact/simhash dedup compose in one streaming query") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    input.addData(
      (1L, ts(0), "the quick brown fox jumps over the dog"),   // survivor
      (2L, ts(1), "too short"),                                 // gated: < 4 tokens
      (3L, ts(2), "the  quick brown fox jumps over the dog"),   // ws-noise exact dup of 1 → fingerprint drop
      (4L, ts(3), "dog the over jumps fox brown quick the"),    // multiset permutation of 1 → simhash drop
      (5L, ts(4), "a completely different document about reach me at a@b.co")) // survivor, PII scrubbed
    val q = Streams.curateStream(input.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "text", minTokens = 4, minQuality = 0.0)
      .writeStream.format("memory").queryName("cur8").outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("cur8").select($"doc_id", $"text", $"lang")
        .as[(Long, String, String)].collect().map(t => t._1 -> t).toMap
      assert(out.keySet === Set(1L, 5L), s"got ${out.keySet}")
      // canonicalization happened before emission: the email is redacted
      assert(out(5L)._2.contains("<EMAIL>") && !out(5L)._2.contains("a@b.co"))
      // the enrichment columns rode along
      assert(out(1L)._3 === "en")
    } finally q.stop()
  }

  test("curateStream at fixture scale: survivors are batch-equivalent (gates, scrub, dedup)") {
    import graft.functions.{TextFns, Expressions}
    implicit val sq = spark.sqlContext
    // all 500 sf0.001 documents through the streaming gate in doc_id order
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select($"doc_id", $"text").orderBy($"doc_id").as[(Long, String)].collect()
    val input = MemoryStream[(Long, Timestamp, String)]
    input.addData(docs.zipWithIndex.map { case ((id, t), i) => (id, ts(i / 60), t) }.toSeq)
    val q = Streams.curateStream(input.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "text")
      .writeStream.format("memory").queryName("cur_fx").outputMode("append").start()
    val got = try {
      q.processAllAvailable()
      spark.table("cur_fx").select($"doc_id", $"text").as[(Long, String)].collect()
    } finally q.stop()
    // the BATCH expression of the same semantics on the same input
    val canon = graft.sources.Tables.table(spark, sf, "documents")
      .select($"doc_id",
        TextFns.scrubPii(Expressions.normalizeText($"text", "NFC")).as("text"))
    val gated = canon
      .filter(TextFns.tokenCount($"text") >= 20 &&
        TextFns.qualityScore($"text") >= 0.5)
      .select($"doc_id", $"text",
        TextFns.fingerprint64($"text").as("fp"),
        Expressions.simhash64($"text").as("sh"))
      .as[(Long, String, Long, Long)].collect()
    assert(gated.nonEmpty && got.nonEmpty, "fixture produced no gated documents")
    val gatedById = gated.map(r => r._1 -> r).toMap
    // 1. every stream survivor passed the batch gate, with identical scrub
    got.foreach { case (id, text) =>
      assert(gatedById.contains(id), s"stream kept doc $id that the batch gate rejects")
      assert(gatedById(id)._2 === text, s"scrubbed text diverged for doc $id")
    }
    // 2. dedup equivalence, representative-independent: fingerprint-equal
    //    texts are whitespace-variants, so their token MULTISETS — hence
    //    simhashes — coincide; the surviving simhash set must therefore
    //    equal the batch-distinct simhash set regardless of which dup won
    val batchSh = gated.map(_._4).toSet
    val gotSh = got.map { case (id, _) => gatedById(id)._4 }.toSet
    assert(gotSh === batchSh, "surviving simhash set diverged from batch distinct")
    assert(got.length === batchSh.size,
      s"stream kept ${got.length} rows for ${batchSh.size} distinct simhashes")
  }

  test("curateStream under the RocksDB state store: batch-equivalent output, provider engaged") {
    implicit val sq = spark.sqlContext
    // the 100 TB launch shape: state off-heap in RocksDB instead of the
    // executor heap — output must be identical to the default provider's
    val prior = Streams.rocksDbStateStore.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    Streams.rocksDbStateStore.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val docs = graft.sources.Tables.table(spark, sf, "documents")
        .select($"doc_id", $"text").orderBy($"doc_id").as[(Long, String)].collect()
      val input = MemoryStream[(Long, Timestamp, String)]
      input.addData(docs.zipWithIndex.map { case ((id, t), i) => (id, ts(i / 60), t) }.toSeq)
      val q = Streams.curateStream(input.toDF().toDF("doc_id", "ts", "text"),
          "doc_id", "text")
        .writeStream.format("memory").queryName("cur_rdb").outputMode("append").start()
      val (got, progressJson) = try {
        q.processAllAvailable()
        (spark.table("cur_rdb").select($"doc_id").as[Long].collect().toSet,
          q.lastProgress.json)
      } finally q.stop()
      // the provider really was RocksDB (its custom metrics are in the
      // progress), not a silently-ignored conf
      assert(progressJson.contains("rocksdb"),
        s"no rocksdb state metrics in progress: $progressJson")
      // identical survivor set to the default-provider fixture run: the
      // same batch-equivalence argument as the test above, compressed to
      // set equality against the batch-distinct simhash count
      import graft.functions.{TextFns, Expressions}
      val gated = graft.sources.Tables.table(spark, sf, "documents")
        .select($"doc_id",
          TextFns.scrubPii(Expressions.normalizeText($"text", "NFC")).as("text"))
        .filter(TextFns.tokenCount($"text") >= 20 &&
          TextFns.qualityScore($"text") >= 0.5)
        .select($"doc_id", TextFns.fingerprint64($"text").as("fp"),
          Expressions.simhash64($"text").as("sh"))
        .as[(Long, Long, Long)].collect()
      assert(got.subsetOf(gated.map(_._1).toSet),
        "rocksdb run kept a doc the batch gate rejects")
      assert(got.size === gated.map(_._3).toSet.size,
        "rocksdb survivor count diverged from batch-distinct simhashes")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Restart-recovery equivalence harness: runs curateStream over the
    * first half of the fixture, STOPS the query, restarts from the same
    * checkpoint over the second half (which contains whitespace-variant
    * twins of half-1 survivors under new negative ids), and asserts the
    * combined survivor set equals an uninterrupted run's. If the dedup
    * state (seen fingerprints/simhashes) did not cross the restart, the
    * twins would survive run 2 and the sets would diverge. foreachBatch
    * sink: the memory sink refuses checkpoint recovery by design.
    */
  private def restartRecoveryRun(ckpt: String): (Set[Long], Set[Long], String) = {
    implicit val sq = spark.sqlContext
    import graft.functions.{TextFns, Expressions}
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select($"doc_id", $"text").orderBy($"doc_id").as[(Long, String)].collect()
    val half1 = docs.take(docs.length / 2)
    // the batch gate's id→simhash map: picks twin sources that actually
    // reach the dedup stage, and powers the representative-independent
    // compare below (fingerprint-equal texts share a token multiset,
    // hence a simhash — which DUP wins is batching-dependent)
    val gatedSh = graft.sources.Tables.table(spark, sf, "documents")
      .select($"doc_id",
        TextFns.scrubPii(Expressions.normalizeText($"text", "NFC")).as("text"))
      .filter(TextFns.tokenCount($"text") >= 20 &&
        TextFns.qualityScore($"text") >= 0.5)
      .select($"doc_id", Expressions.simhash64($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    // cross-boundary dups: EXACT copies of ten GATE-PASSING half-1 texts
    // under fresh negative ids — fingerprint-identical, so run 2 must drop
    // them from state recovered out of the checkpoint (ts within the 1h
    // watermark); their originals were emitted and committed in run 1
    val twins = half1.filter(d => gatedSh.contains(d._1)).take(10)
      .map { case (id, t) => (-(id + 1), t) }
    val half2 = docs.drop(docs.length / 2) ++ twins
    val all = half1 ++ half2
    def shFor(id: Long): Long = gatedSh(if (id < 0) -id - 1 else id)
    def stamped(rows: Array[(Long, String)], base: Int) =
      rows.zipWithIndex.map { case ((id, t), i) => (id, ts((base + i) / 60), t) }.toSeq

    // uninterrupted reference: one query, no stop, same row order/stamps
    val refIn = MemoryStream[(Long, Timestamp, String)]
    refIn.addData(stamped(all, 0))
    val refQ = Streams.curateStream(refIn.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "text")
      .writeStream.format("memory").queryName("cur_ref").outputMode("append").start()
    val ref = try {
      refQ.processAllAvailable()
      spark.table("cur_ref").select($"doc_id").as[Long].collect().toSet
    } finally refQ.stop()

    // interrupted run: same stream instance, two query incarnations over
    // one checkpoint dir; survivors collected per incarnation
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(Long, Timestamp, String)]
    def start() = Streams.curateStream(
        input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = df.select(col("doc_id")).as[Long](implicitly).collect()
        got.synchronized { got ++= ids }: Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    input.addData(stamped(half1, 0))
    val q1 = start()
    val lastProgress = try { q1.processAllAvailable(); q1.lastProgress.json }
      finally q1.stop() // clean stop: all delivered batches committed
    input.addData(stamped(half2, half1.length))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val gotSet = got.toSet
    // 1. THE recovery proof: every twin's original was emitted and
    //    committed in run 1, so a twin surviving run 2 means the dedup
    //    state did not cross the restart
    assert(gotSet.forall(_ >= 0),
      s"cross-boundary twins survived the restart: ${gotSet.filter(_ < 0)}")
    assert(got.length === gotSet.size, "a survivor was emitted twice across the restart")
    // 2. batch-equivalence across the boundary, representative-independent:
    //    same survivor COUNT and same surviving simhash set as the
    //    uninterrupted run (which dup of a set wins is batching-dependent)
    assert(gotSet.size === ref.size,
      s"restarted run kept ${gotSet.size} docs vs uninterrupted ${ref.size}")
    assert(gotSet.map(shFor) === ref.map(shFor),
      "surviving simhash set diverged from the uninterrupted run")
    (ref, gotSet, lastProgress)
  }

  test("curateStream restart from checkpoint: survivor set crosses the boundary exactly-once (heap provider)") {
    restartRecoveryRun(
      java.nio.file.Files.createTempDirectory("graft_rs_heap").toString): Unit
  }

  test("curateStream restart from checkpoint: survivor set crosses the boundary exactly-once (RocksDB provider)") {
    val prior = Streams.rocksDbStateStore.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    Streams.rocksDbStateStore.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val (_, _, progress) = restartRecoveryRun(
        java.nio.file.Files.createTempDirectory("graft_rs_rdb").toString)
      // the provider really was RocksDB (changelog checkpointing is the
      // restart machinery under test), not a silently-ignored conf
      assert(progress.contains("rocksdb"),
        s"no rocksdb state metrics in progress: $progress")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("curateStream: blocklist ratio gate streams as a stateless filter") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    input.addData(
      (1L, ts(0), "casino jackpot casino prize casino bets"),          // 4/6 banned → dies
      (2L, ts(1), "one stray casino word in a long clean document")) // 1/9 → ships
    val q = Streams.curateStream(input.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "text", minTokens = 4, minQuality = 0.0,
        blockTerms = Seq("casino", "jackpot"), blockMaxRatio = 0.2)
      .writeStream.format("memory").queryName("curbl").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("curbl").select("doc_id").as[Long].collect().toSet === Set(2L))
    } finally q.stop()
  }

  test("simhashDedupStream drops token-multiset duplicates, keeps distinct text") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    input.addData(
      (1L, ts(0), "the quick brown fox"),
      (2L, ts(1), "fox   brown the\tquick"), // same multiset: dropped
      (3L, ts(2), "a completely different document"))
    val q = Streams.simhashDedupStream(input.toDF().toDF("doc_id", "ts", "text"), "text")
      .writeStream.format("memory").queryName("shd").outputMode("append").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("shd").select("doc_id").as[Long].collect().toSet
      assert(kept.contains(3L) && kept.size === 2)
      assert(kept.intersect(Set(1L, 2L)).size === 1) // exactly one of the twins
    } finally q.stop()
  }

  test("dedupStream drops in-horizon duplicates") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "x", 1.0),
      Event(1, ts(0), 1, "x", 1.0), // exact dup
      Event(2, ts(1), 1, "x", 1.0))
    val q = Streams.dedupStream(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dd").count() === 2)
    } finally q.stop()
  }

  test("enrichStream joins a broadcast dimension; unmatched events survive") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 2, "view", 2.0),
      Event(3, ts(2), 99, "click", 3.0)) // user 99 not in the dimension
    val dim = Seq((1L, "pro"), (2L, "free")).toDF("user_id", "tier")
    val q = Streams.enrichStream(input.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enr").select("event_id", "tier")
        .as[(Long, Option[String])].collect().toMap
      assert(got === Map(1L -> Some("pro"), 2L -> Some("free"), 3L -> None))
    } finally q.stop()
  }

  test("intervalJoinStreams pairs keys within the time bound only") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    clicks.addData(
      Event(1, ts(0), 1, "click", 0),
      Event(2, ts(0), 2, "click", 0))
    buys.addData(
      Event(10, ts(5), 1, "buy", 9.0),   // within 10 min of user 1's click
      Event(11, ts(40), 2, "buy", 7.0))  // 40 min after user 2's click → out of bound
    val l = clicks.toDF().select($"user_id", $"event_id".as("click_id"), $"ts".as("l_ts"))
    val r = buys.toDF().select($"user_id", $"event_id".as("buy_id"), $"ts".as("r_ts"))
    // selecting the join KEY must resolve (the right side's copy is
    // dropped) — the regression this test pins
    val q = Streams.intervalJoinStreams(l, r, Seq("user_id"), "l_ts", "r_ts")
      .select("user_id", "click_id", "buy_id").drop("user_id")
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ij").as[(Long, Long)].collect().toSeq
      assert(got === Seq((1L, 10L)))
    } finally q.stop()
  }
}
