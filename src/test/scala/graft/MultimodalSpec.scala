package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = Multimodal.syntheticAssets(spark, 30)

  test("extractFeatures: array<float> of requested dim, unit norm, deterministic") {
    val f = Multimodal.extractFeatures(assets, dim = 16).cache()
    assert(f.count() === 30)
    assert(f.schema("features").dataType.simpleString === "array<float>")
    val dims = f.select(size($"features")).distinct().as[Int].collect().toSeq
    assert(dims === Seq(16))
    val norms = f.select(sqrt(aggregate($"features", lit(0.0), (a, x) => a + x * x)).as("n"))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    // deterministic: re-running yields identical vectors
    val again = Multimodal.extractFeatures(assets, dim = 16)
    assert(f.exceptAll(again).isEmpty)
  }

  test("resizeImages touches only image rows and updates meta") {
    val out = Multimodal.resizeImages(assets, 32, 32).cache()
    val images = out.filter(_.modality == "image").collect()
    assert(images.forall(a => a.meta.width === 32 && a.meta.height === 32))
    val audio = out.filter(_.modality == "audio").collect()
    val origAudio = assets.filter(_.modality == "audio").collect()
    assert(audio.map(_.meta).toSeq === origAudio.map(_.meta).toSeq)
  }

  test("sampleFrames emits duration/every rows per video") {
    val frames = Multimodal.sampleFrames(assets, everyMs = 10000)
    val perVideo = frames.groupBy("asset_id").count().select("count").distinct().as[Long].collect()
    assert(perVideo.toSeq === Seq(6L)) // 60s video / 10s sampling
    val idx = frames.filter($"asset_id" === 2).orderBy("frame_index")
      .select("frame_ts_ms").as[Long].collect().toSeq
    assert(idx === Seq(0L, 10000L, 20000L, 30000L, 40000L, 50000L))
  }

  test("payloadStats aggregates per modality") {
    val st = Multimodal.payloadStats(assets).collect().map(r =>
      r.getAs[String]("modality") -> r.getAs[Long]("n_assets")).toMap
    assert(st === Map("image" -> 10L, "audio" -> 10L, "video" -> 10L))
  }
}
