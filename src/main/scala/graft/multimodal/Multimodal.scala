package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata struct, with
  * decode / feature-extraction / resize / frame-sampling operators as
  * `mapPartitions` stages (the Scala analog of arrow-batched Pandas UDFs:
  * one JVM pass per partition, batch-shaped, no per-row closure dispatch).
  *
  * Decode is REAL wherever the JDK has a codec: binary PGM/PPM via
  * [NetpbmCodec], JPEG/PNG/GIF/BMP via [ImageIoCodec] (javax.imageio),
  * and WAV/PCM audio via [WavCodec] (javax.sound.sampled) — all pure JVM,
  * no native libs. VIDEO decode (and compressed audio: mp3/ogg/flac) is
  * still the loudly-labeled [StubCodec]: ffmpeg/JNI territory, no codec
  * library in this container. The Spark-side contract — schema,
  * partitioning, batch iteration, null handling — is identical on both
  * paths; swapping StubCodec for a JNI/ffmpeg codec is a one-function
  * change on the same mapPartitions seam the real codecs use.
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

  /** REAL codec for the binary netpbm formats — PGM (`P5`, grayscale) and
    * PPM (`P6`, RGB) — pure JVM, no native libs: header is ASCII tokens
    * (magic, width, height, maxval; `#` comments legal between tokens),
    * followed by one binary byte per sample. The one trivial image format
    * this container can decode for real, so the multimodal family has a
    * genuine decode → transform → encode path through the same
    * mapPartitions seam the stub uses; [StubCodec] remains the
    * loudly-labeled stand-in for everything else (JPEG/ffmpeg territory).
    */
  object NetpbmCodec {
    /** Decoded raster: `channels` = 1 (PGM) or 3 (PPM), `pixels` row-major,
      * channel-interleaved, one byte per sample.
      */
    case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

    /** None for anything that isn't a well-formed 8-bit binary PGM/PPM
      * (wrong magic, maxval > 255, truncated raster) — the caller falls
      * back to the stub path rather than crashing the partition.
      */
    def decode(payload: Array[Byte]): Option[Image] = {
      if (payload.length < 2 || payload(0) != 'P' ||
        (payload(1) != '5' && payload(1) != '6')) return None
      val channels = if (payload(1) == '5') 1 else 3
      var pos = 2
      // next ASCII integer token, skipping whitespace and # comments; a
      // digit run past Int range (corrupt/hostile header) is a malformed
      // token, not an exception — decode must never crash the partition
      def nextInt(): Option[Int] = {
        while (pos < payload.length &&
          (payload(pos).toChar.isWhitespace || payload(pos) == '#')) {
          if (payload(pos) == '#')
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          else pos += 1
        }
        val start = pos
        while (pos < payload.length && payload(pos).toChar.isDigit) pos += 1
        if (pos == start || pos - start > 9) None
        else Some(new String(payload, start, pos - start, "US-ASCII").toInt)
      }
      for {
        w <- nextInt(); h <- nextInt(); maxval <- nextInt()
        if w > 0 && h > 0 && maxval > 0 && maxval <= 255
        // exactly ONE whitespace byte separates maxval from the raster
        if pos < payload.length && payload(pos).toChar.isWhitespace
        raster = java.util.Arrays.copyOfRange(payload, pos + 1, payload.length)
        // LONG arithmetic: w*h*channels can overflow Int for hostile dims
        // (65536×65536 wraps to 0 and would "match" an empty raster)
        if raster.length.toLong == w.toLong * h * channels
      } yield Image(w, h, channels, raster)
    }

    def encode(img: Image): Array[Byte] = {
      val header = s"P${if (img.channels == 1) 5 else 6}\n${img.width} ${img.height}\n255\n"
        .getBytes("US-ASCII")
      val out = new Array[Byte](header.length + img.pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
      out
    }

    /** Nearest-neighbor resample (source pixel ⌊i·srcDim/dstDim⌋ — the
      * standard box-free mapping, deterministic, no fp accumulation).
      */
    def resize(img: Image, w: Int, h: Int): Image = {
      require(w > 0 && h > 0, s"target dims must be positive: ${w}x$h")
      val out = new Array[Byte](w * h * img.channels)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * img.height / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * img.width / w).toInt
          var c = 0
          while (c < img.channels) {
            out((y * w + x) * img.channels + c) =
              img.pixels((sy * img.width + sx) * img.channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      Image(w, h, img.channels, out)
    }
  }

  /** REAL codec for JPEG/PNG (+ GIF/BMP — whatever the JDK's registry
    * serves) via `javax.imageio` — pure JVM, ships in the JDK, no native
    * libs. Decodes to the same raster shape as [NetpbmCodec.Image] so the
    * resample and re-encode stages are codec-agnostic; re-encode is PNG
    * (lossless, so the resized raster round-trips bit-exactly, unlike a
    * JPEG re-encode which would re-lose information per hop). JPEG pixel
    * values are deterministic within a JVM but are the DECODER's output,
    * not SQL-re-derivable — so value oracles audit dims/channels/codec
    * identity and pixel values stay ScalaTest-verified (MultimodalSpec);
    * [NetpbmCodec] remains the bit-deterministic oracle format.
    */
  object ImageIoCodec {
    // stream-to-disk cache off: payloads are in-memory byte arrays and the
    // default temp-file cache would add IO (and a writable-tmpdir
    // dependency) per decode on every executor
    javax.imageio.ImageIO.setUseCache(false)

    /** None for anything the JDK's reader registry can't decode (garbage,
      * truncated files, netpbm — the JDK has no PNM reader) — callers fall
      * back to the next codec rather than crashing the partition.
      */
    def decode(payload: Array[Byte]): Option[NetpbmCodec.Image] =
      try {
        val buf = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (buf == null) None
        else {
          val w = buf.getWidth
          val h = buf.getHeight
          val channels =
            if (buf.getColorModel.getNumColorComponents > 1) 3 else 1
          // grayscale sample depth: a 16-bit gray PNG's raster samples are
          // 0..65535 — a bare .toByte would truncate them mod 256 and feed
          // corrupted pixels downstream. >8-bit samples keep their high
          // byte (>> bits-8); sub-byte samples (1/2/4-bit) stretch to the
          // full 0..255 range so binary white is 255, not 1.
          val grayBits =
            if (channels == 1) buf.getColorModel.getComponentSize(0) else 8
          val out = new Array[Byte](w * h * channels)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val base = (y * w + x) * channels
              if (channels == 3) {
                // getRGB normalizes every color BufferedImage type to
                // packed sRGB — one deterministic read path regardless of
                // the reader's internal layout (3BYTE_BGR, INT_RGB, indexed)
                val rgb = buf.getRGB(x, y)
                out(base) = ((rgb >> 16) & 0xff).toByte
                out(base + 1) = ((rgb >> 8) & 0xff).toByte
                out(base + 2) = (rgb & 0xff).toByte
              } else {
                // grayscale reads the raster sample directly: getRGB would
                // round-trip through the sRGB colorspace transform and
                // perturb stored values by ±2 (measured) — not lossless
                val s = buf.getRaster.getSample(x, y, 0)
                out(base) =
                  (if (grayBits == 8) s
                   else if (grayBits > 8) s >> (grayBits - 8)
                   else (s * 255) / ((1 << grayBits) - 1)).toByte
              }
              x += 1
            }
            y += 1
          }
          Some(NetpbmCodec.Image(w, h, channels, out))
        }
      } catch { case _: Exception => None } // malformed ≠ partition crash

    /** Lossless PNG re-encode of a raster (gray or RGB). */
    def encodePng(img: NetpbmCodec.Image): Array[Byte] = {
      val buf = new java.awt.image.BufferedImage(img.width, img.height,
        if (img.channels == 3) java.awt.image.BufferedImage.TYPE_INT_RGB
        else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val base = (y * img.width + x) * img.channels
          if (img.channels == 3)
            buf.setRGB(x, y,
              ((img.pixels(base) & 0xff) << 16) |
                ((img.pixels(base + 1) & 0xff) << 8) |
                (img.pixels(base + 2) & 0xff))
          else
            // raster write, not setRGB: the sRGB→gray colorspace transform
            // inside setRGB perturbs stored samples — see decode
            buf.getRaster.setSample(x, y, 0, img.pixels(base) & 0xff)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(buf, "png", bos)
      bos.toByteArray
    }

    /** JPEG encode (test-fixture generator: the REAL input format a
      * training corpus's image column carries).
      */
    def encodeJpeg(img: NetpbmCodec.Image): Array[Byte] = {
      val buf = new java.awt.image.BufferedImage(img.width, img.height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val base = (y * img.width + x) * img.channels
          val rgb =
            if (img.channels == 3)
              ((img.pixels(base) & 0xff) << 16) |
                ((img.pixels(base + 1) & 0xff) << 8) |
                (img.pixels(base + 2) & 0xff)
            else {
              val g = img.pixels(base) & 0xff
              (g << 16) | (g << 8) | g
            }
          buf.setRGB(x, y, rgb)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(buf, "jpg", bos)
      bos.toByteArray
    }
  }

  /** REAL codec for WAV/PCM audio via `javax.sound.sampled` — pure JVM,
    * ships in the JDK, no native libs (the round-12 imageio move repeated
    * for the audio half of the multimodal seam). Decodes any WAV the JDK
    * reader accepts, normalizing to 16-bit signed little-endian PCM (the
    * JDK's PCM↔PCM converter handles 8-bit unsigned and big-endian
    * sources), so downstream stages see ONE sample shape. Decoded sample
    * values are the CONVERTER's output — deterministic in-JVM but not
    * SQL-re-derivable — so value oracles audit rate/channels/frames/
    * duration (id-pure in the synthetic fixture) and sample values stay
    * ScalaTest-verified (MultimodalSpec), the qm03 discipline.
    */
  object WavCodec {
    /** Decoded clip: `samples` frame-major, channel-interleaved, 16-bit. */
    case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
      def frames: Int = samples.length / channels
      /** Integer ms (truncating) — matches the SQL twin's `//` division. */
      def durationMs: Long = frames.toLong * 1000L / sampleRate
    }

    /** None for anything the JDK's audio registry can't read (garbage,
      * truncated RIFF, compressed codecs the JDK lacks) — callers fall
      * back to the stub path rather than crashing the partition.
      */
    def decode(payload: Array[Byte]): Option[Audio] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val alreadyPcm16le =
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian
          val pcm =
            if (alreadyPcm16le) in
            else javax.sound.sampled.AudioSystem.getAudioInputStream(
              new javax.sound.sampled.AudioFormat(
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
                fmt.getSampleRate, 16, fmt.getChannels,
                fmt.getChannels * 2, fmt.getSampleRate, false), in)
          val bytes = pcm.readAllBytes()
          val ch = fmt.getChannels
          // a frame is ch×2 bytes; a ragged tail means the stream lied
          // about its length (truncated mid-frame) — reject, don't guess
          if (ch < 1 || bytes.length % (ch * 2) != 0) None
          else {
            val samples = new Array[Short](bytes.length / 2)
            var i = 0
            while (i < samples.length) {
              samples(i) =
                ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
              i += 1
            }
            Some(Audio(math.round(fmt.getSampleRate), ch, samples))
          }
        } finally in.close()
      } catch { case _: Exception => None } // malformed ≠ partition crash

    /** 16-bit signed little-endian PCM WAV bytes. */
    def encode(a: Audio): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        a.sampleRate.toFloat, 16, a.channels, a.channels * 2,
        a.sampleRate.toFloat, false)
      val bytes = new Array[Byte](a.samples.length * 2)
      var i = 0
      while (i < a.samples.length) {
        bytes(2 * i) = (a.samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((a.samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), fmt,
          (a.samples.length / a.channels).toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** 8-bit unsigned PCM WAV (test-fixture generator: the legacy input
      * shape that exercises decode's 8→16-bit conversion path, the audio
      * analog of [ImageIoCodec.encodeJpeg]). Mono/multichannel, samples
      * 0..255 frame-major interleaved.
      */
    def encodePcm8(sampleRate: Int, channels: Int, samples: Array[Byte]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        sampleRate.toFloat, 8, channels, channels, sampleRate.toFloat, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(samples), fmt,
          (samples.length / channels).toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Nearest-frame resample to `targetRate` (source frame
      * ⌊f·srcFrames/outFrames⌋ — the same box-free integer mapping as
      * [NetpbmCodec.resize], deterministic, no fp accumulation; the
      * resample-to-16kHz normalization an ASR/TTS data pipeline runs).
      */
    def resample(a: Audio, targetRate: Int): Audio = {
      require(targetRate > 0, s"target rate must be positive: $targetRate")
      if (targetRate == a.sampleRate) return a
      val srcFrames = a.frames
      val outFrames = (srcFrames.toLong * targetRate / a.sampleRate).toInt
      val out = new Array[Short](outFrames * a.channels)
      var f = 0
      while (f < outFrames) {
        val sf = (f.toLong * srcFrames / outFrames).toInt
        var c = 0
        while (c < a.channels) {
          out(f * a.channels + c) = a.samples(sf * a.channels + c)
          c += 1
        }
        f += 1
      }
      Audio(targetRate, a.channels, out)
    }
  }

  /** One decode attempt through the codec chain: cheap magic-byte netpbm
    * first, then the JDK ImageIO registry. None = undecodable.
    */
  def decodeImage(payload: Array[Byte]): Option[(String, NetpbmCodec.Image)] =
    NetpbmCodec.decode(payload).map(("netpbm", _))
      .orElse(ImageIoCodec.decode(payload).map(("imageio", _)))

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

  /** Image resize: non-image rows pass through untouched; image payloads
    * are re-encoded and meta updated — schema-preserving, narrow. Payloads
    * decode through the REAL codec chain — binary PGM/PPM via
    * [NetpbmCodec] (re-encoded netpbm), JPEG/PNG/GIF/BMP via
    * [ImageIoCodec] (re-encoded lossless PNG) — with the same
    * nearest-neighbor resample either way; only payloads NO codec accepts
    * fall back to the loudly-labeled [StubCodec] stand-in.
    */
  def resizeImages(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map {
        case a if a.modality == "image" =>
          val (resized, format) = decodeImage(a.payload) match {
            case Some(("netpbm", img)) =>
              (NetpbmCodec.encode(NetpbmCodec.resize(img, w, h)), a.meta.format)
            case Some((_, img)) =>
              (ImageIoCodec.encodePng(NetpbmCodec.resize(img, w, h)), "png")
            case None => (StubCodec.resize(a.payload, w, h), a.meta.format)
          }
          a.copy(payload = resized,
            meta = a.meta.copy(format = format, width = w, height = h))
        case a => a
      }
    }
  }

  /** Decode audit over an image column: which codec (if any) accepts each
    * payload, and the DECODED dims/channels — the corpus-intake health
    * check a 100 TB multimodal ingest runs before spending GPU-decode on
    * it. Narrow scan-shaped pass (mapPartitions, no shuffle); codec is
    * "none" (null dims) for undecodable payloads instead of an error, so
    * one corrupt blob can't kill the audit.
    */
  def imageAudit(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decodeImage(a.payload) match {
          case Some((codec, img)) =>
            (a.asset_id, codec, Some(img.width), Some(img.height),
              Some(img.channels))
          case None => (a.asset_id, "none", None, None, None)
        }
      }
    }.toDF("asset_id", "codec", "width", "height", "channels")
  }

  /** Deterministic mixed-format image table for the qm03 audit: one third
    * real binary netpbm (PGM for even ids, PPM for odd), one third real
    * JPEG (encoded by the JDK's own writer — the format a real training
    * corpus's image column carries), one third garbage bytes (the corrupt
    * blobs a real crawl always contains). Dims are pure functions of the
    * id so a SQL oracle re-derives the audit without touching payload
    * bytes.
    */
  def syntheticImageAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val w = 8 + (i % 5).toInt
      val h = 6 + (i % 7).toInt
      val channels = if (i % 2 == 0) 1 else 3
      def raster(ch: Int) = Array.tabulate[Byte](w * h * ch)(j =>
        ((i * 31 + j * 7) % 251).toByte)
      val (payload, format) = (i % 3) match {
        case 0 =>
          val img = NetpbmCodec.Image(w, h, channels, raster(channels))
          (NetpbmCodec.encode(img), if (channels == 1) "pgm" else "ppm")
        case 1 =>
          (ImageIoCodec.encodeJpeg(NetpbmCodec.Image(w, h, 3, raster(3))), "jpg")
        case _ =>
          // deterministic junk that no reader accepts (no known magic)
          (Array.tabulate[Byte](64)(j => ((i * 13 + j * 11) % 249).toByte), "bin")
      }
      Asset(i, "image", payload, AssetMeta(format, w, h, 0, 0L))
    }
  }

  /** Decode audit over an audio column — the [imageAudit] twin: which
    * payloads the JDK's WAV reader accepts, plus the DECODED rate/
    * channels/frames/duration. Narrow scan-shaped pass (mapPartitions,
    * no shuffle); codec "none" (null fields) for undecodable payloads.
    */
  def audioAudit(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        WavCodec.decode(a.payload) match {
          case Some(au) =>
            (a.asset_id, "wav", Some(au.sampleRate), Some(au.channels),
              Some(au.frames), Some(au.durationMs))
          case None => (a.asset_id, "none", None, None, None, None)
        }
      }
    }.toDF("asset_id", "codec", "sample_rate", "channels", "n_frames",
      "duration_ms")
  }

  /** Audio resample-to-target-rate (default 16 kHz — the ASR/TTS pipeline
    * normalization): non-audio rows pass through untouched; decodable WAV
    * payloads resample through the REAL codec and re-encode as 16-bit PCM
    * WAV with meta updated; payloads the reader rejects fall back to the
    * loudly-labeled [StubCodec] stand-in (same contract as
    * [resizeImages]' undecodable branch). Schema-preserving, narrow.
    */
  def resampleAudio(assets: Dataset[Asset], targetHz: Int = 16000): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map {
        case a if a.modality == "audio" =>
          WavCodec.decode(a.payload) match {
            case Some(au) =>
              val r = WavCodec.resample(au, targetHz)
              a.copy(payload = WavCodec.encode(r),
                meta = a.meta.copy(format = "wav", sampleRate = targetHz,
                  durationMs = r.durationMs))
            case None =>
              a.copy(payload = StubCodec.resize(a.payload, targetHz, 1),
                meta = a.meta.copy(sampleRate = targetHz))
          }
        case a => a
      }
    }
  }

  /** Modality-dispatched decode audit over a MIXED image+audio column —
    * the single intake pass a multimodal corpus runs: image payloads
    * through the [decodeImage] chain, audio through [WavCodec]; one row
    * per asset, the non-applicable half of the columns null. Narrow,
    * scan-shaped, one decode attempt per payload.
    */
  def multimodalAudit(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        a.modality match {
          case "image" => decodeImage(a.payload) match {
            case Some((codec, img)) =>
              (a.asset_id, a.modality, codec, Some(img.width),
                Some(img.height), Some(img.channels),
                None: Option[Int], None: Option[Int], None: Option[Long])
            case None =>
              (a.asset_id, a.modality, "none", None, None, None, None, None, None)
          }
          case "audio" => WavCodec.decode(a.payload) match {
            case Some(au) =>
              (a.asset_id, a.modality, "wav", None: Option[Int],
                None: Option[Int], Some(au.channels), Some(au.sampleRate),
                Some(au.frames), Some(au.durationMs))
            case None =>
              (a.asset_id, a.modality, "none", None, None, None, None, None, None)
          }
          case _ =>
            (a.asset_id, a.modality, "none", None, None, None, None, None, None)
        }
      }
    }.toDF("asset_id", "modality", "codec", "width", "height", "channels",
      "sample_rate", "n_frames", "duration_ms")
  }

  /** Deterministic mixed image+audio table for the qm04 audit — the qm03
    * contract extended across modalities. id mod 6 picks the shape:
    * 0 = real binary netpbm (PGM when (i/6)%2=0 else PPM), 2 = real JPEG,
    * 1 = real 16-bit PCM WAV, 3 = real 8-bit unsigned PCM WAV (exercises
    * decode's format-conversion path), 4/5 = corrupt blobs tagged image/
    * audio. Every decoded field is a pure function of the id so a SQL
    * oracle re-derives the full audit frame without touching payload
    * bytes (which stay ScalaTest-verified down to sample values).
    * Image dims: (8+i%5)×(6+i%7); audio rate 8000·(1+(i/6)%3), frames
    * 160·(1+i%5); 16-bit channels 1+(i/6)%2, 8-bit mono.
    */
  def syntheticMixedAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val w = 8 + (i % 5).toInt
      val h = 6 + (i % 7).toInt
      val rate = 8000 * (1 + ((i / 6) % 3).toInt)
      val frames = 160 * (1 + (i % 5).toInt)
      def raster(ch: Int) = Array.tabulate[Byte](w * h * ch)(j =>
        ((i * 31 + j * 7) % 251).toByte)
      (i % 6) match {
        case 0 =>
          val ch = if ((i / 6) % 2 == 0) 1 else 3
          Asset(i, "image", NetpbmCodec.encode(
            NetpbmCodec.Image(w, h, ch, raster(ch))),
            AssetMeta(if (ch == 1) "pgm" else "ppm", w, h, 0, 0L))
        case 2 =>
          Asset(i, "image",
            ImageIoCodec.encodeJpeg(NetpbmCodec.Image(w, h, 3, raster(3))),
            AssetMeta("jpg", w, h, 0, 0L))
        case 1 =>
          val ch = 1 + ((i / 6) % 2).toInt
          val samples = Array.tabulate[Short](frames * ch)(j =>
            (((i * 131 + j * 17) % 4001 - 2000) * 16).toShort)
          Asset(i, "audio", WavCodec.encode(WavCodec.Audio(rate, ch, samples)),
            AssetMeta("wav", 0, 0, rate, frames.toLong * 1000L / rate))
        case 3 =>
          val samples = Array.tabulate[Byte](frames)(j =>
            ((i * 29 + j * 13) % 256).toByte)
          Asset(i, "audio", WavCodec.encodePcm8(rate, 1, samples),
            AssetMeta("wav", 0, 0, rate, frames.toLong * 1000L / rate))
        case m =>
          // deterministic junk no reader accepts (no known magic)
          Asset(i, if (m == 4) "image" else "audio",
            Array.tabulate[Byte](64)(j => ((i * 13 + j * 11) % 249).toByte),
            AssetMeta("bin", 0, 0, 0, 0L))
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
