package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extract / resize /
  * frame-sample run as batched per-partition transforms.
  *
  * IMAGE decode is REAL: [[decodeImages]] reads PNG/JPEG/BMP/GIF through the
  * JDK's `javax.imageio` (no external libraries) and emits per-channel
  * statistics. AUDIO decode is REAL ([[parseWavHeader]] RIFF/PCM parsing)
  * and VIDEO containers parse for real too ([[videoMetadata]]'s ISO-BMFF
  * box walk — duration/dims/codec without any codec). Only the per-FRAME
  * pixel decode remains STUBBED (`decodeBatchStub` — no
  * JDK codec exists): a deterministic fake derived from the bytes keeps the
  * Spark-side plumbing — schema, batching, partition behavior, output
  * shapes — fully testable, so swapping the stub body for a JNI/ffmpeg call
  * changes no plan shape. At 100 TB the rule is: metadata-only predicates
  * (format/width/duration) filter BEFORE bytes are decoded, and decode runs
  * once per partition batch, never per driver row.
  */
object Multimodal {

  // image decode must work on display-less executors, and must not spill
  // decode scratch to executor-local disk. Applied lazily on the JVM that
  // actually decodes (executor-side), not as a class-load side effect, and
  // headless is only set when the host app hasn't chosen a value itself.
  @transient private lazy val imageIoConfigured: Boolean = {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  /** media metadata struct literal: (format, width, height, duration_ms). */
  def mediaMeta(format: Column, width: Column, height: Column,
                durationMs: Column): Column =
    struct(format.cast("string").as("format"), width.cast("int").as("width"),
      height.cast("int").as("height"), durationMs.cast("long").as("duration_ms"))

  case class MediaRow(id: Long, content: Array[Byte], format: String,
                      width: Int, height: Int)
  case class DecodedRow(id: Long, features: Array[Float], decodeOk: Boolean)

  /** STUB decode: a real implementation hands `batch` (already grouped to
    * `batchSize`) to the native decoder. The fake derives `featureDim`
    * floats deterministically from the content bytes so tests can assert
    * batch shape, ordering, and determinism end-to-end. */
  private def decodeBatchStub(batch: Seq[MediaRow], featureDim: Int): Seq[DecodedRow] =
    batch.map { r =>
      if (r.content == null || r.content.isEmpty) DecodedRow(r.id, Array.empty, decodeOk = false)
      else {
        val feats = new Array[Float](featureDim)
        var h = 1125899906842597L // deterministic FNV-ish fold of the bytes
        r.content.foreach(b => h = h * 31 + b)
        var i = 0
        while (i < featureDim) {
          h = h * 6364136223846793005L + 1442695040888963407L
          feats(i) = ((h >>> 33).toDouble / (1L << 31).toDouble - 0.5).toFloat
          i += 1
        }
        DecodedRow(r.id, feats, decodeOk = true)
      }
    }

  /** Decode + feature-extract: batched mapPartitions over (id, content,
    * meta). Input frame needs columns (id, content, format, width, height).
    * Returns (id, features array<float>, decode_ok). */
  def decodeFeatures(df: DataFrame, featureDim: Int = 64,
                     batchSize: Int = 64): DataFrame = {
    val ds: Dataset[MediaRow] = df
      .select(col("id").cast("long").as("id"), col("content"),
        col("format").cast("string").as("format"),
        col("width").cast("int").as("width"), col("height").cast("int").as("height"))
      .as(Encoders.product[MediaRow])
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decodeBatchStub(batch.toSeq, featureDim))
    }(Encoders.product[DecodedRow])
      .toDF("id", "features", "decode_ok")
  }

  case class ImageRow(id: Long, content: Array[Byte])
  /** `channels` is the SOURCE color model's component count (1 gray, 3 RGB,
    * 4 RGBA); `means`/`stds` are ALWAYS length 3, computed over the sRGB
    * projection regardless of `channels` — consumers must not index them by
    * `channels` (a grayscale image has channels=1 but 3 identical means). */
  case class ImageFeatures(id: Long, width: Int, height: Int, channels: Int,
                           means: Array[Double], stds: Array[Double],
                           decodeOk: Boolean)

  /** Decode one batch of images with `javax.imageio`. Channel sums
    * accumulate as exact integers so a solid-color w×h image (n a power of
    * two) reproduces mean = c/255 to the last bit — the q45 oracle relies
    * on this. `channels` reports the source color model's component count
    * (1 gray, 3 RGB, 4 RGBA), while means/stds are always computed over the
    * sRGB projection `getRGB` returns — alpha weights are not applied.
    * Undecodable bytes flag `decodeOk = false`, never throw. */
  private def decodeImageBatch(batch: Seq[ImageRow]): Seq[ImageFeatures] =
    batch.map { r =>
      val img =
        try {
          require(imageIoConfigured)
          if (r.content == null || r.content.isEmpty) null
          else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
        } catch { case _: Exception => null }
      if (img == null)
        ImageFeatures(r.id, 0, 0, 0, Array.empty, Array.empty, decodeOk = false)
      else {
        val w = img.getWidth; val h = img.getHeight
        val sums = new Array[Long](3); val sqs = new Array[Long](3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            var c = 0
            while (c < 3) {
              val v = (rgb >>> (16 - 8 * c)) & 0xff
              sums(c) += v; sqs(c) += v.toLong * v; c += 1
            }
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val means = sums.map(s => s.toDouble / n / 255.0)
        val stds = sums.indices.map { c =>
          val m = sums(c).toDouble / n
          math.sqrt(math.max(0.0, sqs(c).toDouble / n - m * m)) / 255.0
        }.toArray
        ImageFeatures(r.id, w, h, img.getColorModel.getNumComponents,
          means, stds, decodeOk = true)
      }
    }

  /** Real image decode + channel statistics: batched mapPartitions over
    * (id, content). Output: (id, width, height, channels, means, stds,
    * decode_ok), means/stds normalized to [0,1] per RGB channel. */
  def decodeImages(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val ds: Dataset[ImageRow] = df
      .select(col("id").cast("long").as("id"), col("content"))
      .as(Encoders.product[ImageRow])
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decodeImageBatch(batch.toSeq))
    }(Encoders.product[ImageFeatures])
      .toDF("id", "width", "height", "channels", "means", "stds", "decode_ok")
  }

  case class DHashRow(id: Long, dhash: Option[Long], decodeOk: Boolean)

  /** Perceptual difference hash (dHash) of one image: the luminance is
    * block-averaged onto a 9×8 grid with EXACT integer-boundary area
    * averaging (no interpolation, so the hash is bit-deterministic on any
    * JVM), and bit (j·8+i) records cell(i,j) < cell(i+1,j). Horizontal
    * gradients survive uniform brightness/contrast shifts and re-encoding,
    * which is what makes the hash perceptual: a brightened copy of an
    * image hashes identically, while structurally different images land
    * ~32 bits apart. */
  private def dHashOne(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val cells = Array.ofDim[Double](8, 9)
    var j = 0
    while (j < 8) {
      val y0 = j * h / 8; val y1 = math.max((j + 1) * h / 8, y0 + 1)
      var i = 0
      while (i < 9) {
        val x0 = i * w / 9; val x1 = math.max((i + 1) * w / 9, x0 + 1)
        var sum = 0L; var n = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >>> 16) & 0xff) + ((rgb >>> 8) & 0xff) + (rgb & 0xff)
            n += 1
            x += 1
          }
          y += 1
        }
        cells(j)(i) = if (n == 0) 0.0 else sum.toDouble / n
        i += 1
      }
      j += 1
    }
    var bits = 0L
    j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (cells(j)(i) < cells(j)(i + 1)) bits |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    bits
  }

  /** Perceptual hash per image: (id, dhash, decode_ok) — batched
    * mapPartitions like [[decodeImages]] (no Catalyst codec exists);
    * undecodable bytes flag decode_ok = false with a NULL dhash, so the
    * pair kernel drops them (a sentinel hash would cluster every corrupt
    * item at one value and pair failures with each other). Pair
    * [[graft.ops.Dedup.hammingPairs]] on the output for image
    * near-duplicate candidates without an all-pairs join. */
  def imageDHash(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val ds: Dataset[ImageRow] = df
      .select(col("id").cast("long").as("id"), col("content"))
      .as(Encoders.product[ImageRow])
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val img =
          try {
            require(imageIoConfigured)
            if (r.content == null || r.content.isEmpty) null
            else javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.content))
          } catch { case _: Exception => null }
        if (img == null) DHashRow(r.id, None, decodeOk = false)
        else DHashRow(r.id, Some(dHashOne(img)), decodeOk = true)
      })
    }(Encoders.product[DHashRow])
      .toDF("id", "dhash", "decode_ok")
  }

  /** Deterministic block-pattern PNG bytes: a w×h image tiled with 4×4-px
    * blocks whose gray level is an LCG of (seed, block) mapped into
    * [40, 200] — far from the 0/255 clip rails, so adding a uniform
    * `brightness` offset shifts every pixel EXACTLY and the dHash is
    * unchanged. Fixture generator for the image near-dup tests/oracle. */
  def patternPngBytes(seed: Long, w: Int, h: Int, brightness: Int): Array[Byte] = {
    require(imageIoConfigured)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // splitmix64 finalizer: an affine hash here leaves patterns of
        // different seeds as uniform mod-shifts of each other, which
        // mostly preserves the cell ORDER comparisons dHash is built on —
        // avalanche is what makes distinct seeds perceptually distinct
        var z = (x / 4).toLong * 1000003L + (y / 4).toLong * 7919L + seed
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^= z >>> 31
        val g0 = 40 + java.lang.Long.remainderUnsigned(z, 161L).toInt
        val g = math.min(255, g0 + brightness)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Column form of [[patternPngBytes]]. */
  val patternPng: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(patternPngBytes _)

  /** Deterministic solid-color PNG bytes (JDK encoder) — fixture generator
    * for decode tests and the q45 closed-form oracle. */
  def solidPngBytes(r: Int, g: Int, b: Int, w: Int, h: Int): Array[Byte] = {
    // encode goes through ImageIO too: without the config, the first encode
    // per executor JVM runs with useCache=true and spills a
    // FileCacheImageOutputStream temp file to executor-local disk
    require(imageIoConfigured)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Column form of [[solidPngBytes]]. */
  val solidPng: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(solidPngBytes _)

  case class AudioRow(id: Long, content: Array[Byte])
  case class AudioFeatures(id: Long, sampleRate: Int, channels: Int,
                           nSamples: Long, means: Array[Double],
                           rms: Array[Double], decodeOk: Boolean)

  /** Decode one batch of RIFF/WAVE PCM-16 audio clips — a REAL decoder
    * (pure chunk parsing, no codec library): walks the RIFF chunk list,
    * requires fmt audioFormat=1 (PCM) at 16 bits, and accumulates
    * per-channel sample sums and squared sums as exact longs, so a
    * constant-amplitude clip reproduces mean = rms = a/32768 to the last
    * bit (the q112 oracle relies on this — a/32768 is a power-of-two
    * division, exact in IEEE). Means and RMS are normalized to [-1, 1].
    * Malformed/truncated/non-PCM bytes flag decodeOk = false, never
    * throw. */
  private case class WavInfo(rate: Int, channels: Int, dataOff: Int,
                             nFrames: Long)

  /** RIFF/WAVE PCM-16 header walk shared by [[decodeAudio]] and
    * [[audioFingerprint]]: None for malformed/truncated/non-PCM bytes. */
  private def parseWavHeader(b: Array[Byte]): Option[WavInfo] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong | (u8(i + 3).toLong << 24)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    try {
      if (b == null || b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
        None
      else {
        var pos = 12
        var channels = 0; var rate = 0; var fmtOk = false
        var dataOff = -1; var dataLen = 0L
        while (pos + 8 <= b.length) {
          val id = tag(pos); val sz = le32(pos + 4)
          if (id == "fmt " && sz >= 16) {
            fmtOk = le16(pos + 8) == 1 && le16(pos + 8 + 14) == 16
            channels = le16(pos + 8 + 2)
            rate = le32(pos + 8 + 4).toInt
          } else if (id == "data") {
            dataOff = pos + 8
            dataLen = math.min(sz, (b.length - dataOff).toLong)
          }
          // a corrupt size must terminate the walk, not wrap pos negative
          if (sz < 0 || sz > b.length) pos = b.length
          else pos += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
        }
        if (!fmtOk || channels <= 0 || dataOff < 0) None
        else Some(WavInfo(rate, channels, dataOff, dataLen / (channels * 2)))
      }
    } catch { case _: Exception => None }
  }

  private def decodeWavBatch(batch: Seq[AudioRow]): Seq[AudioFeatures] =
    batch.map { r =>
      val b = r.content
      def fail = AudioFeatures(r.id, 0, 0, 0L, Array.empty, Array.empty,
        decodeOk = false)
      def u8(i: Int): Int = b(i) & 0xff
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      try {
        parseWavHeader(b) match {
          case None => fail
          case Some(WavInfo(rate, channels, dataOff, n)) =>
            val frameBytes = channels * 2
            val sums = new Array[Long](channels)
            val sqs = new Array[Long](channels)
            var f = 0L
            while (f < n) {
              val base = dataOff + (f * frameBytes).toInt
              var c = 0
              while (c < channels) {
                val v = le16(base + 2 * c).toShort.toInt
                sums(c) += v; sqs(c) += v.toLong * v; c += 1
              }
              f += 1
            }
            val means =
              if (n == 0) Array.fill(channels)(0.0)
              else sums.map(s => s.toDouble / n / 32768.0)
            val rms =
              if (n == 0) Array.fill(channels)(0.0)
              else sqs.map(q => math.sqrt(q.toDouble / n) / 32768.0)
            AudioFeatures(r.id, rate, channels, n, means, rms, decodeOk = true)
        }
      } catch { case _: Exception => fail }
    }

  case class AudioFpRow(id: Long, afp: Option[Long], decodeOk: Boolean)

  /** Volume-invariant audio fingerprint — the audio twin of
    * [[imageDHash]]: the first channel's |sample| mass is block-averaged
    * onto 65 exact integer-boundary windows and bit k records
    * avg(k) < avg(k+1). Scaling every sample by a constant (volume)
    * scales the averages uniformly, so comparisons — and the hash — are
    * unchanged; structurally different clips land ~32 bits apart.
    * Undecodable bytes flag decode_ok = false with a NULL afp, so the
    * pair kernel drops them. Pair with [[graft.ops.Dedup.hammingPairs]]
    * for near-dup candidates. */
  def audioFingerprint(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val ds: Dataset[AudioRow] = df
      .select(col("id").cast("long").as("id"), col("content"))
      .as(Encoders.product[AudioRow])
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val b = r.content
        def u8(i: Int): Int = b(i) & 0xff
        def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
        try {
          parseWavHeader(b) match {
            case Some(WavInfo(_, channels, dataOff, n)) if n >= 65 =>
              val frameBytes = channels * 2
              val avgs = new Array[Double](65)
              var k = 0
              while (k < 65) {
                val f0 = k * n / 65; val f1 = (k + 1) * n / 65
                var sum = 0L
                var f = f0
                while (f < f1) {
                  sum += math.abs(le16(dataOff + (f * frameBytes).toInt)
                    .toShort.toInt).toLong
                  f += 1
                }
                avgs(k) = sum.toDouble / (f1 - f0)
                k += 1
              }
              var bits = 0L
              k = 0
              while (k < 64) {
                if (avgs(k) < avgs(k + 1)) bits |= 1L << k
                k += 1
              }
              AudioFpRow(r.id, Some(bits), decodeOk = true)
            case _ => AudioFpRow(r.id, None, decodeOk = false)
          }
        } catch { case _: Exception => AudioFpRow(r.id, None, decodeOk = false) }
      })
    }(Encoders.product[AudioFpRow])
      .toDF("id", "afp", "decode_ok")
  }

  /** Deterministic block-pattern PCM-16 mono WAV: 16-sample blocks
    * (SHORTER than the fingerprint's ~n/65 windows, so adjacent windows
    * average different block mixes — the image fixture's lesson) whose
    * amplitude is an EVEN splitmix64 value in [1000, 8998], so an exact
    * half-volume copy (`scaleDiv = 2`) divides every sample without
    * rounding and fingerprints identically. Fixture generator for the
    * audio near-dup tests/oracle. */
  def patternWavBytes(seed: Long, nSamples: Int, rate: Int,
                      scaleDiv: Int): Array[Byte] = {
    val samples = new Array[Int](nSamples)
    var f = 0
    while (f < nSamples) {
      var z = (f / 16).toLong * 1000003L + seed
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= z >>> 31
      val amp = 1000 + 2 * java.lang.Long.remainderUnsigned(z, 4000L).toInt
      samples(f) = amp / scaleDiv
      f += 1
    }
    val dataLen = nSamples * 2
    val bos = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bos.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate)
      .putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    f = 0
    while (f < nSamples) { bos.putShort(samples(f).toShort); f += 1 }
    bos.array()
  }

  /** Column form of [[patternWavBytes]]. */
  val patternWav: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(patternWavBytes _)

  /** Real PCM-WAV decode + per-channel statistics: batched mapPartitions
    * over (id, content) — the audio twin of [[decodeImages]]. Output:
    * (id, sample_rate, channels, n_samples, means, rms, decode_ok). */
  def decodeAudio(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val ds: Dataset[AudioRow] = df
      .select(col("id").cast("long").as("id"), col("content"))
      .as(Encoders.product[AudioRow])
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decodeWavBatch(batch.toSeq))
    }(Encoders.product[AudioFeatures])
      .toDF("id", "sample_rate", "channels", "n_samples", "means", "rms",
        "decode_ok")
  }

  /** Deterministic constant-amplitude PCM-16 WAV bytes (one value per
    * channel) — fixture generator for decode tests and the q112
    * closed-form oracle. */
  def constWavBytes(amps: Array[Int], nSamples: Int, rate: Int): Array[Byte] = {
    val ch = amps.length
    val dataLen = nSamples * ch * 2
    val bos = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bos.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var f = 0
    while (f < nSamples) {
      var c = 0
      while (c < ch) { bos.putShort(amps(c).toShort); c += 1 }
      f += 1
    }
    bos.array()
  }

  /** Column form of [[constWavBytes]] for a MONO clip. */
  val constWavMono: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((amp: Int, n: Int, rate: Int) => constWavBytes(Array(amp), n, rate))

  /** Frame sampling plan for video rows: emits (id, frame_index, ts_ms) for
    * `fps`-spaced frames of each row's duration — pure column expressions
    * (sequence + explode); the decode of each sampled frame then rides the
    * same batched stub path. */
  def sampleFrames(df: DataFrame, id: Column, durationMs: Column,
                   everyMs: Long): DataFrame =
    df.select(id.cast("long").as("id"), durationMs.cast("long").as("dur"))
      .filter(col("dur") > 0)
      .select(col("id"),
        posexplode(sequence(lit(0L), col("dur") - 1, lit(everyMs)))
          .as(Seq("frame_index", "ts_ms")))

  /** Metadata-computed resize plan: target dims preserving aspect ratio with
    * max side `maxSide` — the arithmetic the real resizer would use, kept as
    * columns so it can gate/batch work without touching bytes. */
  def resizePlan(width: Column, height: Column, maxSide: Int): Column = {
    val scale = lit(maxSide.toDouble) / greatest(width, height).cast("double")
    val s = least(scale, lit(1.0))
    struct(round(width * s).cast("int").as("w"), round(height * s).cast("int").as("h"),
      (s < 1.0).as("needs_resize"))
  }

  // ---------------------------------------------------- video containers

  case class VideoMetaRow(id: Long, durationMs: Option[Long], nTracks: Int,
                          width: Option[Int], height: Option[Int],
                          videoCodec: Option[String],
                          audioCodec: Option[String], decodeOk: Boolean)

  /** Minimal ISO-BMFF (MP4/MOV) box walk over the CONTAINER structure —
    * pure chunk parsing like [[parseWavHeader]], no codec: mvhd gives the
    * movie timescale/duration, each trak contributes tkhd dims (16.16
    * fixed point) + its mdia/hdlr handler ('vide'/'soun') + the first
    * stsd sample-entry fourcc (the codec tag: avc1, hvc1, mp4a, ...).
    * 64-bit largesize boxes and version-1 mvhd/tkhd are handled; anything
    * malformed or truncated returns None. This is the metadata that lets
    * a 100 TB video pipeline filter (duration/dims/codec predicates)
    * BEFORE any frame bytes are decoded. */
  private def parseMp4Meta(b: Array[Byte]): Option[VideoMetaRow] = {
    if (b == null || b.length < 16) return None
    def u16(i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def fourcc(i: Int): String = new String(b, i, 4, "US-ASCII")
    var durationMs: Option[Long] = None
    var nTracks = 0
    var width: Option[Int] = None
    var height: Option[Int] = None
    var videoCodec: Option[String] = None
    var audioCodec: Option[String] = None
    var sawMvhd = false
    // per-trak scratch (tkhd precedes mdia/hdlr inside its trak)
    var tw = 0; var th = 0; var thandler = ""; var tcodec = ""
    def walk(from: Long, to: Long, depth: Int): Boolean = {
      var p = from
      while (p + 8 <= to) {
        val size0 = u32(p.toInt)
        val typ = fourcc(p.toInt + 4)
        val (payload, boxEnd) =
          if (size0 == 1L) {
            if (p + 16 > to) return false
            val sz = u64(p.toInt + 8)
            if (sz < 16 || p + sz > to) return false
            (p + 16, p + sz)
          } else if (size0 == 0L) (p + 8, to) // box runs to container end
          else {
            if (size0 < 8 || p + size0 > to) return false
            (p + 8, p + size0)
          }
        typ match {
          case "moov" | "minf" | "stbl" =>
            if (!walk(payload, boxEnd, depth + 1)) return false
          case "trak" =>
            tw = 0; th = 0; thandler = ""; tcodec = ""
            if (!walk(payload, boxEnd, depth + 1)) return false
            nTracks += 1
            if (thandler == "vide") {
              if (width.isEmpty && tw > 0) { width = Some(tw); height = Some(th) }
              if (videoCodec.isEmpty && tcodec.nonEmpty) videoCodec = Some(tcodec)
            } else if (thandler == "soun" && audioCodec.isEmpty && tcodec.nonEmpty)
              audioCodec = Some(tcodec)
          case "mdia" =>
            if (!walk(payload, boxEnd, depth + 1)) return false
          case "mvhd" =>
            val q = payload.toInt
            val v = b(q) & 0xff
            val (ts, dur) =
              if (v == 1) (u32(q + 20), u64(q + 24)) else (u32(q + 12), u32(q + 16))
            if (ts == 0) return false
            durationMs = Some(dur * 1000L / ts)
            sawMvhd = true
          case "tkhd" =>
            val q = payload.toInt
            val v = b(q) & 0xff
            val off = if (v == 1) 88 else 76 // fixed-point 16.16 dims
            if (q + off + 8 <= b.length) {
              tw = u16(q + off); th = u16(q + off + 4)
            }
          case "hdlr" =>
            thandler = fourcc(payload.toInt + 8)
          case "stsd" =>
            // [v+flags 4][entry_count 4][entry_size 4][entry fourcc 4]
            if (u32(payload.toInt + 4) > 0 && payload + 16 <= boxEnd)
              tcodec = fourcc(payload.toInt + 12)
          case _ => () // ftyp, free, mdat, mdhd, ... skipped at every depth
        }
        p = boxEnd
      }
      true
    }
    try {
      if (!walk(0L, b.length.toLong, 0) || !sawMvhd) None
      else Some(VideoMetaRow(0L, durationMs, nTracks, width, height,
        videoCodec, audioCodec, decodeOk = true))
    } catch { case _: Exception => None }
  }

  /** Container metadata per video: (id, duration_ms, n_tracks, width,
    * height, video_codec, audio_codec, decode_ok) — batched mapPartitions
    * over (id, content) like the image/audio tiers; unparseable bytes
    * flag decode_ok = false with all-null metadata. The 100 TB idiom this
    * enables: metadata predicates (duration < x, codec = avc1, dims sane)
    * prune the corpus BEFORE any per-frame decode is scheduled. */
  def videoMetadata(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val ds: Dataset[AudioRow] = df
      .select(col("id").cast("long").as("id"), col("content"))
      .as(Encoders.product[AudioRow])
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        parseMp4Meta(r.content) match {
          case Some(m) => m.copy(id = r.id)
          case None => VideoMetaRow(r.id, None, 0, None, None, None, None,
            decodeOk = false)
        }
      })
    }(Encoders.product[VideoMetaRow])
      .toDF("id", "duration_ms", "n_tracks", "width", "height",
        "video_codec", "audio_codec", "decode_ok")
  }

  /** Deterministic fixture MP4: a structurally-valid ISO-BMFF header tree
    * (ftyp + moov[mvhd + video trak(tkhd/mdia/hdlr/minf/stbl/stsd=avc1)
    * [+ audio trak(...stsd=mp4a)]] + empty mdat) with the given dims and
    * duration (movie timescale 1000). No media samples — the metadata
    * walk is the unit under test, exactly the part of the file a
    * filter-before-decode pipeline reads. */
  def patternMp4Bytes(w: Int, h: Int, durationMs: Long,
                      withAudio: Boolean): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len) // big-endian
      bb.putInt(len).put(typ.getBytes("US-ASCII"))
      payload.foreach(bb.put)
      bb.array()
    }
    def full(n: Int)(fill: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(n)
      fill(bb)
      bb.array()
    }
    val mvhd = box("mvhd", full(100) { bb =>
      bb.putInt(0).putInt(0).putInt(0).putInt(1000) // v+flags, times, timescale
        .putInt(durationMs.toInt).putInt(0x00010000).putShort(0x0100.toShort)
      bb.position(bb.position() + 10) // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt) // unity matrix
      bb.position(bb.position() + 24) // predefined
      bb.putInt(3) // next track id
    })
    def tkhd(trackId: Int, tw: Int, th: Int) = box("tkhd", full(84) { bb =>
      bb.putInt(7).putInt(0).putInt(0).putInt(trackId).putInt(0)
        .putInt(durationMs.toInt)
      bb.position(bb.position() + 8) // reserved
      bb.putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/vol/res
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt)
      bb.putInt(tw << 16).putInt(th << 16) // 16.16 fixed
    })
    def hdlr(handler: String) = box("hdlr", full(25) { bb =>
      bb.putInt(0).putInt(0).put(handler.getBytes("US-ASCII"))
      bb.position(bb.position() + 12)
      bb.put(0.toByte) // empty name
    })
    def mdhd = box("mdhd", full(24) { bb =>
      bb.putInt(0).putInt(0).putInt(0).putInt(1000).putInt(durationMs.toInt)
        .putShort(0x55c4.toShort).putShort(0) // und language
    })
    def stsd(codec: String) = box("stsd", full(8) { bb =>
      bb.putInt(0).putInt(1)
    }, full(16) { bb =>
      bb.putInt(16).put(codec.getBytes("US-ASCII"))
      bb.position(bb.position() + 6)
      bb.putShort(1) // data_ref_index
    })
    def trak(trackId: Int, handler: String, codec: String, tw: Int, th: Int) =
      box("trak", tkhd(trackId, tw, th),
        box("mdia", mdhd, hdlr(handler),
          box("minf", box("stbl", stsd(codec)))))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"),
      full(4)(_.putInt(512)), "isomiso2".getBytes("US-ASCII"))
    val traks = Seq(trak(1, "vide", "avc1", w, h)) ++
      (if (withAudio) Seq(trak(2, "soun", "mp4a", 0, 0)) else Nil)
    val moov = box("moov", (mvhd +: traks): _*)
    val mdat = box("mdat")
    (ftyp ++ moov ++ mdat)
  }

  /** Column form of [[patternMp4Bytes]]. */
  val patternMp4: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(patternMp4Bytes _)
}
