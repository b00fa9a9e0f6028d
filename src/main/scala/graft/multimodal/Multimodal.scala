package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata struct, with
  * decode / feature-extraction / resize / frame-sampling operators as
  * `mapPartitions` stages (the Scala analog of arrow-batched Pandas UDFs:
  * one JVM pass per partition, batch-shaped, no per-row closure dispatch).
  *
  * DECODE IS A STUB: this container has no image/audio codecs, so
  * `StubCodec` derives deterministic fake pixels/samples from the payload
  * bytes. The Spark-side contract — schema, partitioning, batch iteration,
  * null handling — is real and tested; swapping StubCodec for a JNI/ffmpeg
  * codec is a one-function change.
  */
object Multimodal {

  /** Typed per-asset metadata (width/height for images, sampleRate/duration
    * for audio/video; unused fields zeroed).
    */
  case class AssetMeta(format: String, width: Int, height: Int,
                       sampleRate: Int, durationMs: Long)

  case class Asset(asset_id: Long, modality: String, payload: Array[Byte], meta: AssetMeta)

  /** Deterministic fake codec — NOT a real decoder (see object doc). */
  object StubCodec {
    /** "Decode" payload bytes to a fixed-dim float feature vector:
      * byte-histogram projection, deterministic in the payload alone.
      */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        v(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1.0f
        i += 1
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      if (n > 0) v.map(_ / n) else v
    }

    /** "Resize": deterministic payload re-hash standing in for a pixel
      * resample; output length scales with the target area.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // empty payload (corrupt/truncated blob) → empty result, like
      // features(); payload(i % 0) would throw ArithmeticException
      if (payload.isEmpty) return Array.emptyByteArray
      val out = new Array[Byte]((w.toLong * h % 4096).toInt max 16)
      var i = 0
      while (i < out.length) {
        out(i) = payload(i % payload.length)
        i += 1
      }
      out
    }
  }

  /** Deterministic synthetic asset table (ids → payload bytes), for tests
    * and benches; modality round-robins image/audio/video.
    */
  def syntheticAssets(spark: SparkSession, n: Int, payloadBytes: Int = 256): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val payload = Array.tabulate[Byte](payloadBytes)(j => ((i * 31 + j * 7) % 251).toByte)
      val modality = Seq("image", "audio", "video")((i % 3).toInt)
      val meta = modality match {
        case "image" => AssetMeta("png", 640, 480, 0, 0L)
        case "audio" => AssetMeta("wav", 0, 0, 16000, 30000L)
        case _       => AssetMeta("mp4", 1280, 720, 0, 60000L)
      }
      Asset(i, modality, payload, meta)
    }
  }

  /** Feature extraction: binary payload → `array<float>` embedding column.
    * mapPartitions keeps the codec call per-batch and the plan a single
    * narrow stage — at 100 TB this is a scan-shaped pass, no shuffle.
    */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 64): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map(a => (a.asset_id, a.modality, StubCodec.features(a.payload, dim)))
    }.toDF("asset_id", "modality", "features")
  }

  /** Image resize: non-image rows pass through untouched; image payloads are
    * re-encoded and meta updated — schema-preserving, narrow.
    */
  def resizeImages(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map {
        case a if a.modality == "image" =>
          a.copy(payload = StubCodec.resize(a.payload, w, h),
            meta = a.meta.copy(width = w, height = h))
        case a => a
      }
    }
  }

  /** Video frame sampling: one output row per sampled frame timestamp
    * (duration / everyMs rows per video) — a generator (explode) over the
    * metadata, leaving payload decode to the downstream consumer.
    */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long): DataFrame = {
    // durationMs <= 0 (probe failed / metadata missing) → zero frames, not
    // an Illegal-sequence-boundaries crash
    val videos = assets.toDF()
      .filter(col("modality") === "video" && col("meta.durationMs") > 0)
    videos.select(col("asset_id"), col("meta.durationMs").as("duration_ms"),
        explode(sequence(lit(0L), col("meta.durationMs") - 1, lit(everyMs))).as("frame_ts_ms"))
      .withColumn("frame_index", (col("frame_ts_ms") / everyMs).cast("long"))
  }

  /** Bytes-per-asset statistics by modality — the kind of audit aggregate a
    * 100 TB multimodal corpus needs before training (skew detection, size
    * budgeting).
    */
  def payloadStats(assets: Dataset[Asset]): DataFrame =
    assets.toDF().select(col("modality"), length(col("payload")).as("bytes"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_assets"), sum(col("bytes")).as("total_bytes"),
        min(col("bytes")).as("min_bytes"), max(col("bytes")).as("max_bytes"))
}
