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

  test("NetpbmCodec: encode/decode round-trip, comments, rejects malformed") {
    import Multimodal.NetpbmCodec
    // 4x2 RGB gradient
    val px = Array.tabulate[Byte](4 * 2 * 3)(i => (i * 11 % 256).toByte)
    val img = NetpbmCodec.Image(4, 2, 3, px)
    val back = NetpbmCodec.decode(NetpbmCodec.encode(img)).get
    assert(back.width === 4 && back.height === 2 && back.channels === 3)
    assert(back.pixels.toSeq === px.toSeq)
    // header comments are legal between tokens
    val commented = ("P5\n# a comment\n2 1\n# another\n255\n".getBytes("US-ASCII") ++
      Array[Byte](7, 9))
    val c = NetpbmCodec.decode(commented).get
    assert(c.width === 2 && c.height === 1 && c.channels === 1 && c.pixels.toSeq === Seq[Byte](7, 9))
    // malformed: wrong magic, truncated raster, 16-bit maxval
    assert(NetpbmCodec.decode("JFIF....".getBytes("US-ASCII")).isEmpty)
    assert(NetpbmCodec.decode("P5\n2 2\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(NetpbmCodec.decode(("P5\n1 1\n65535\n".getBytes("US-ASCII") ++
      Array[Byte](0, 0))).isEmpty)
    // hostile headers must reject, not throw: an over-Int digit run
    // (NumberFormatException without the 9-digit cap) and dims whose
    // product wraps Int (65536 x 65536 -> 0 would "match" an empty raster)
    assert(NetpbmCodec.decode(("P5\n3000000000 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1))).isEmpty)
    assert(NetpbmCodec.decode("P5\n65536 65536\n255\n".getBytes("US-ASCII")).isEmpty)
  }

  test("ImageIoCodec: real JPEG decode — dimensions exact, pixels within lossy tolerance") {
    import Multimodal.{ImageIoCodec, NetpbmCodec}
    // flat-color 16x12 RGB: JPEG is lossy but a uniform block survives
    // DCT quantization nearly exactly, so spot pixel values are checkable
    val px = Array.tabulate[Byte](16 * 12 * 3) { i =>
      (i % 3 match { case 0 => 200; case 1 => 100; case _ => 50 }).toByte
    }
    val jpeg = ImageIoCodec.encodeJpeg(NetpbmCodec.Image(16, 12, 3, px))
    // it's a real JFIF payload (FF D8 SOI marker), not a stub product
    assert((jpeg(0) & 0xff) === 0xff && (jpeg(1) & 0xff) === 0xd8,
      "missing JPEG SOI marker")
    val img = ImageIoCodec.decode(jpeg).get
    assert(img.width === 16 && img.height === 12 && img.channels === 3)
    // spot-check corners + center: each channel within quantization slack
    for (pos <- Seq(0, (12 / 2 * 16 + 8) * 3, (16 * 12 - 1) * 3)) {
      assert(math.abs((img.pixels(pos) & 0xff) - 200) <= 8, s"R at $pos")
      assert(math.abs((img.pixels(pos + 1) & 0xff) - 100) <= 8, s"G at $pos")
      assert(math.abs((img.pixels(pos + 2) & 0xff) - 50) <= 8, s"B at $pos")
    }
    // netpbm payloads are NOT ImageIO's business (no PNM reader in the JDK)
    assert(ImageIoCodec.decode(NetpbmCodec.encode(
      NetpbmCodec.Image(2, 1, 1, Array[Byte](7, 9)))).isEmpty)
    // malformed payloads reject, never throw
    assert(ImageIoCodec.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(ImageIoCodec.decode(Array.emptyByteArray).isEmpty)
    // truncated JPEG (header intact, entropy data cut) must not crash
    assert(ImageIoCodec.decode(jpeg.take(jpeg.length / 4)).isEmpty ||
      ImageIoCodec.decode(jpeg.take(jpeg.length / 4)).isDefined) // either is safe
  }

  test("ImageIoCodec: PNG round-trips the raster bit-exactly (gray and RGB)") {
    import Multimodal.{ImageIoCodec, NetpbmCodec}
    val rgb = NetpbmCodec.Image(5, 3, 3,
      Array.tabulate[Byte](45)(i => (i * 17 % 256).toByte))
    val backRgb = ImageIoCodec.decode(ImageIoCodec.encodePng(rgb)).get
    assert(backRgb.width === 5 && backRgb.height === 3 && backRgb.channels === 3)
    assert(backRgb.pixels.toSeq === rgb.pixels.toSeq)
    val gray = NetpbmCodec.Image(4, 4, 1,
      Array.tabulate[Byte](16)(i => (i * 13 % 256).toByte))
    val backGray = ImageIoCodec.decode(ImageIoCodec.encodePng(gray)).get
    assert(backGray.channels === 1)
    assert(backGray.pixels.toSeq === gray.pixels.toSeq)
  }

  test("ImageIoCodec: 16-bit gray PNG keeps the high byte (no mod-256 truncation)") {
    import Multimodal.ImageIoCodec
    // a USHORT_GRAY raster whose samples all have a ZERO low byte and a
    // distinct high byte: truncation (.toByte of the raw sample) would
    // read every pixel as 0; the correct >>8 reads back the high byte
    val buf = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 2; x <- 0 until 4)
      buf.getRaster.setSample(x, y, 0, (y * 4 + x + 1) << 8)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(buf, "png", bos)
    val img = ImageIoCodec.decode(bos.toByteArray).get
    assert(img.channels === 1 && img.width === 4 && img.height === 2)
    assert(img.pixels.map(_ & 0xff).toSeq === (1 to 8))
    // 1-bit binary PNG reads back through the INDEXED color model (3
    // color components → the getRGB path): white must come out 255, not
    // the raw palette index 1 — full-range either way, no truncation
    val bin = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    bin.getRaster.setSample(0, 0, 0, 1)
    bin.getRaster.setSample(1, 0, 0, 0)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bin, "png", bos2)
    val img2 = ImageIoCodec.decode(bos2.toByteArray).get
    assert(img2.channels === 3)
    assert(img2.pixels.map(_ & 0xff).toSeq === Seq(255, 255, 255, 0, 0, 0))
  }

  test("resizeImages routes JPEG through the real codec: resized, PNG re-encoded, lossless from there") {
    import Multimodal.{Asset, AssetMeta, ImageIoCodec, NetpbmCodec}
    val px = Array.tabulate[Byte](8 * 8 * 3)(_ => 120.toByte)
    val jpeg = ImageIoCodec.encodeJpeg(NetpbmCodec.Image(8, 8, 3, px))
    val in = Seq(Asset(0L, "image", jpeg, AssetMeta("jpg", 8, 8, 0, 0L))).toDS()
    val out = Multimodal.resizeImages(in, 4, 4).collect().head
    assert(out.meta.format === "png" && out.meta.width === 4)
    // the resized payload is a decodable PNG with the resampled dims
    val back = ImageIoCodec.decode(out.payload).get
    assert(back.width === 4 && back.height === 4 && back.channels === 3)
    // flat color survives jpeg→resize→png within the jpeg tolerance
    assert(back.pixels.forall(p => math.abs((p & 0xff) - 120) <= 8))
  }

  test("imageAudit: codec identity + decoded dims over the mixed synthetic column") {
    val audit = Multimodal.imageAudit(
      Multimodal.syntheticImageAssets(spark, 30)).cache()
    val byCodec = audit.groupBy("codec").count().as[(String, Long)].collect().toMap
    assert(byCodec === Map("netpbm" -> 10L, "imageio" -> 10L, "none" -> 10L))
    // decoded dims match the generator contract for every decodable row
    val bad = audit.filter($"codec" =!= "none")
      .filter($"width" =!= lit(8) + col("asset_id") % 5 ||
        $"height" =!= lit(6) + col("asset_id") % 7).count()
    assert(bad === 0)
    // undecodable rows carry null dims, not junk
    assert(audit.filter($"codec" === "none" && $"width".isNotNull).count() === 0)
  }

  test("resizeImages really resamples netpbm payloads (nearest-neighbor), stub otherwise") {
    import Multimodal.{Asset, AssetMeta, NetpbmCodec}
    // 4x4 grayscale: pixel value = 16*y + x, so the expected 2x2
    // nearest-neighbor sample is exactly rows/cols {0,2}
    val px = Array.tabulate[Byte](16)(i => (16 * (i / 4) + i % 4).toByte)
    val pgm = NetpbmCodec.encode(NetpbmCodec.Image(4, 4, 1, px))
    val in = Seq(
      Asset(0L, "image", pgm, AssetMeta("pgm", 4, 4, 0, 0L)),
      Asset(1L, "image", Array[Byte](1, 2, 3, 4), AssetMeta("png", 640, 480, 0, 0L)))
      .toDS()
    val out = Multimodal.resizeImages(in, 2, 2).collect().sortBy(_.asset_id)
    val real = NetpbmCodec.decode(out(0).payload).get
    assert(real.width === 2 && real.height === 2)
    assert(real.pixels.toSeq === Seq[Byte](0, 2, 32, 34))
    assert(out(0).meta.width === 2 && out(0).meta.height === 2)
    // the non-netpbm payload went through the stub (not decodable as netpbm)
    assert(Multimodal.NetpbmCodec.decode(out(1).payload).isEmpty)
    assert(out(1).meta.width === 2 && out(1).meta.height === 2)
  }

  test("WavCodec: 16-bit PCM round-trips sample values bit-exactly") {
    import Multimodal.WavCodec
    // stereo ramp with negative values — spot-checks byte order and sign
    val samples = Array[Short](0, 100, -100, 32767, -32768, 12345, -12345, 7)
    val wav = WavCodec.encode(WavCodec.Audio(16000, 2, samples))
    // RIFF/WAVE magic present — this is a real container, not a blob
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    val back = WavCodec.decode(wav).get
    assert(back.sampleRate === 16000 && back.channels === 2 && back.frames === 4)
    assert(back.samples.toSeq === samples.toSeq)
    assert(back.durationMs === 0L) // 4 frames / 16kHz truncates to 0 ms
  }

  test("WavCodec: 8-bit unsigned PCM converts to full-range 16-bit signed") {
    import Multimodal.WavCodec
    // the exact scaling is the JDK converter's (float-based, not a bare
    // <<8) — assert the semantics, not the implementation: frame count
    // preserved, midpoint→0, endpoints reach full range, order monotone
    val samples8 = Array[Byte](0, 64, 127.toByte, 128.toByte, 200.toByte, 255.toByte)
    val wav = WavCodec.encodePcm8(8000, 1, samples8)
    val back = WavCodec.decode(wav).get
    assert(back.sampleRate === 8000 && back.channels === 1 && back.frames === 6)
    val s = back.samples
    assert(s(0) === Short.MinValue)          // 0 → full negative
    assert(s(3) === 0)                       // 128 → zero
    assert(s(5) >= 32000)                    // 255 → near full positive
    assert(s.toSeq === s.toSeq.sorted)       // monotone in the input ramp
    assert(math.abs(s(1) - (-16384)) <= 256) // 64 ≈ half negative
  }

  test("WavCodec: rejects garbage and truncated payloads without throwing") {
    import Multimodal.WavCodec
    assert(WavCodec.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
    assert(WavCodec.decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val wav = WavCodec.encode(WavCodec.Audio(8000, 1, Array[Short](1, 2, 3, 4)))
    // header-only truncation must not crash (None or a shorter clip are
    // both safe; the JDK reader trusts the declared data-chunk length)
    val t = WavCodec.decode(wav.take(20))
    assert(t.isEmpty || t.get.frames <= 4)
  }

  test("WavCodec: nearest-frame resample doubles/halves frames, keeps channels aligned") {
    import Multimodal.WavCodec
    // stereo, 4 frames: L=10f R=-10f per frame index f
    val src = WavCodec.Audio(8000, 2,
      Array[Short](0, 0, 10, -10, 20, -20, 30, -30))
    val up = WavCodec.resample(src, 16000)
    assert(up.sampleRate === 16000 && up.frames === 8)
    // frame f reads source frame f/2 — channel pairs stay together
    assert(up.samples.toSeq === Seq[Short](0, 0, 0, 0, 10, -10, 10, -10,
      20, -20, 20, -20, 30, -30, 30, -30))
    val down = WavCodec.resample(up, 8000)
    assert(down.frames === 4 && down.samples.toSeq === src.samples.toSeq)
    // identity resample is a no-op reference
    assert(WavCodec.resample(src, 8000) eq src)
  }

  test("resampleAudio: real WAV resamples to 16kHz through the codec, stub otherwise") {
    import Multimodal.{Asset, AssetMeta, WavCodec}
    val src = WavCodec.Audio(8000, 1, Array.tabulate[Short](800)(j => (j * 3).toShort))
    val in = Seq(
      Asset(0L, "audio", WavCodec.encode(src), AssetMeta("wav", 0, 0, 8000, 100L)),
      Asset(1L, "audio", Array[Byte](9, 9, 9, 9), AssetMeta("mp3", 0, 0, 44100, 1000L)),
      Asset(2L, "image", Array[Byte](1), AssetMeta("png", 8, 8, 0, 0L)))
      .toDS()
    val out = Multimodal.resampleAudio(in, 16000).collect().sortBy(_.asset_id)
    val real = WavCodec.decode(out(0).payload).get
    assert(real.sampleRate === 16000 && real.frames === 1600)
    // nearest-frame upsample: every source sample appears twice in order
    assert(real.samples.toSeq === src.samples.flatMap(s => Seq(s, s)).toSeq)
    assert(out(0).meta.sampleRate === 16000 && out(0).meta.durationMs === 100L)
    // undecodable audio went through the loudly-labeled stub
    assert(WavCodec.decode(out(1).payload).isEmpty)
    assert(out(1).meta.sampleRate === 16000)
    // non-audio rows pass through untouched
    assert(out(2).payload.toSeq === Seq[Byte](1) && out(2).meta.format === "png")
  }

  test("audioAudit + multimodalAudit: codec identity and decoded fields over the mixed column") {
    val mixed = Multimodal.syntheticMixedAssets(spark, 60)
    val audit = Multimodal.multimodalAudit(mixed).cache()
    val byCodec = audit.groupBy("codec").count().as[(String, Long)].collect().toMap
    assert(byCodec === Map("netpbm" -> 10L, "imageio" -> 10L,
      "wav" -> 20L, "none" -> 20L))
    // decoded audio fields match the generator contract (rate
    // 8000·(1+(i/6)%3), frames 160·(1+i%5)) for every decodable audio row
    val badAudio = audit.filter($"codec" === "wav")
      .filter($"sample_rate" =!= lit(8000) * (lit(1) + (col("asset_id") / 6).cast("long") % 3) ||
        $"n_frames" =!= lit(160) * (lit(1) + col("asset_id") % 5)).count()
    assert(badAudio === 0)
    // image rows carry null audio fields and vice versa
    assert(audit.filter($"modality" === "image" && $"sample_rate".isNotNull).count() === 0)
    assert(audit.filter($"modality" === "audio" && $"width".isNotNull).count() === 0)
    // the audio-only audit agrees with the dispatched one on audio rows
    val aa = Multimodal.audioAudit(mixed.filter(_.modality == "audio"))
    val mism = aa.as("a").join(audit.as("m"), "asset_id")
      .filter($"a.codec" =!= $"m.codec" ||
        coalesce($"a.n_frames", lit(-1)) =!= coalesce($"m.n_frames", lit(-1)))
      .count()
    assert(mism === 0)
  }
}
