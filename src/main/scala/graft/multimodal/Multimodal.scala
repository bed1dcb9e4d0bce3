package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * IMAGE decode is REAL: `javax.imageio` (JDK-only, no external codecs)
  * parses PNG/JPEG/GIF/BMP payloads into width/height/channels and a
  * mean pixel intensity. AUDIO decode is REAL: `javax.sound.sampled`
  * parses WAV/AIFF/AU containers into format fields + mean amplitude.
  * Only `video` (no JDK demuxer exists) and payloads the JDK decoders
  * reject fall back to the clearly-marked `fakeDecode` STUB, which
  * derives deterministic pseudo-features from the bytes so the
  * partition-batch plumbing stays testable end-to-end.
  */
object Multimodal {

  // ImageIO's default stream cache writes temp FILES per decode; this is
  // per-record executor work, so keep it purely in-memory.
  javax.imageio.ImageIO.setUseCache(false)

  /** Canonical media schema: id + kind + raw payload + source metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Extracted-feature schema produced by `decodeFeatures`. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)))

  /** Real image decode via the JDK's ImageIO: returns
    * (width, height, channels, meanIntensity) or None when the bytes are
    * not a decodable image format. Mean intensity averages every raster
    * sample (all bands, all pixels) on the 0..255 scale. */
  private[multimodal] def imageDecode(bytes: Array[Byte])
      : Option[(Int, Int, Int, Double)] = {
    // NonFatal, not just IOException: ImageIO plugin readers throw
    // IllegalArgumentException / ArrayIndexOutOfBounds / NegativeArraySize
    // on malformed payloads — a corrupt record must degrade to the stub,
    // not kill the job after 4 task retries.
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val raster = im.getRaster
      val (w, h, bands) = (im.getWidth, im.getHeight, raster.getNumBands)
      var sum = 0.0
      val row = new Array[Int](w * bands)
      var y = 0
      while (y < h) {
        raster.getPixels(0, y, w, 1, row)
        var i = 0
        while (i < row.length) { sum += row(i); i += 1 }
        y += 1
      }
      (w, h, bands, sum / (w.toLong * h * bands))
    }
  }

  /** Encode a real single-color PNG (RGB, all bands = `gray`) — used by
    * tests and the synthetic driver tables to exercise the real ImageIO
    * decode path with exactly predictable features. */
  def syntheticPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g2 = im.createGraphics()
    g2.setColor(new java.awt.Color(gray, gray, gray))
    g2.fillRect(0, 0, width, height)
    g2.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    out.toByteArray
  }

  /** Deterministic media frame of REAL PNG payloads keyed by `media_id`:
    * width = 8 + id % 32, height = 8 + (id / 32) % 32,
    * gray level (= exact mean intensity) = id % 256. The derivation is
    * the contract the DuckDB oracle for `q_media_features` predicts. */
  def synthesizeImages(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val out = ids.select(col("media_id").cast("long"))
      // per-record encode work is CPU-bound while the ids frame is tiny:
      // partition by WORK, not bytes, or the scan coalesces to one task
      .repartition(spark.sparkContext.defaultParallelism)
      .rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = syntheticPng(
            8 + (id % 32).toInt, 8 + ((id / 32) % 32).toInt, (id % 256).toInt)
          Row(id, "image", bytes, null)
        }
    }
    spark.createDataFrame(out, mediaSchema)
  }

  /** Column-gradient PNG: width 9, height 8, column `x` gray level
    * `(id + 31*x) mod 256` — the derivation is the contract the
    * `q_image_dhash` oracle predicts (a per-column-constant image
    * makes every dHash row byte identical and SQL-computable). */
  def syntheticColumnPng(id: Long): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g2 = im.createGraphics()
    var x = 0
    while (x < 9) {
      val g = java.lang.Math.floorMod(id + 31L * x, 256L).toInt
      g2.setColor(new java.awt.Color(g, g, g))
      g2.fillRect(x, 0, 1, 8)
      x += 1
    }
    g2.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    out.toByteArray
  }

  /** Deterministic media frame of column-gradient PNGs (see
    * [[syntheticColumnPng]]). */
  def synthesizeColumnImages(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val out = ids.select(col("media_id").cast("long"))
      // per-record encode work is CPU-bound while the ids frame is tiny:
      // partition by WORK, not bytes, or the scan coalesces to one task
      .repartition(spark.sparkContext.defaultParallelism)
      .rdd.mapPartitions {
      rows => rows.map { r =>
        Row(r.getLong(0), "image", syntheticColumnPng(r.getLong(0)), null)
      }
    }
    spark.createDataFrame(out, mediaSchema)
  }

  /** dHash (difference hash) of an image: block-average the decoded
    * raster to a 9x8 grayscale grid, then bit (row, x) = grid(x+1,row)
    * > grid(x,row) — 64 bits rendered as 16 hex chars (row 0's byte
    * first; within a byte, x is the bit index). The standard cheap
    * perceptual fingerprint: brightness/contrast shifts preserve the
    * gradient SIGNS, so near-identical images share a hash and
    * near-dup detection becomes a hamming-distance ban-join — the
    * image-side analogue of SimHash. Returns None when the payload is
    * not a decodable image. */
  def imageDHash(bytes: Array[Byte]): Option[String] =
    imageGrid9x8(bytes).map { grid =>
      val sb = new StringBuilder(16)
      var r = 0
      while (r < 8) {
        var byte = 0
        var x = 0
        while (x < 8) {
          if (grid(r)(x + 1) > grid(r)(x)) byte |= (1 << x)
          x += 1
        }
        sb.append(f"$byte%02x")
        r += 1
      }
      sb.toString
    }

  /** 9x8 grayscale grid via exact block averaging (grid cell (r, x)
    * averages raster rows [r*h/8, (r+1)*h/8) x cols [x*w/9, (x+1)*w/9),
    * all bands). */
  private def imageGrid9x8(bytes: Array[Byte])
      : Option[Array[Array[Double]]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).filter(im => im.getWidth >= 9 && im.getHeight >= 8)
      .map { im =>
        val raster = im.getRaster
        val (w, h, bands) = (im.getWidth, im.getHeight, raster.getNumBands)
        val grid = Array.ofDim[Double](8, 9)
        val row = new Array[Int](w * bands)
        val sums = Array.ofDim[Double](8, 9)
        val cnts = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < h) {
          val gr = math.min(7, y * 8 / h)
          raster.getPixels(0, y, w, 1, row)
          var x = 0
          while (x < w) {
            val gx = math.min(8, x * 9 / w)
            var b = 0
            while (b < bands) {
              sums(gr)(gx) += row(x * bands + b)
              b += 1
            }
            cnts(gr)(gx) += bands.toLong
            x += 1
          }
          y += 1
        }
        var r = 0
        while (r < 8) {
          var x = 0
          while (x < 9) {
            grid(r)(x) = if (cnts(r)(x) == 0) 0.0 else sums(r)(x) / cnts(r)(x)
            x += 1
          }
          r += 1
        }
        grid
      }
  }

  /** (media_id, dhash) over an image media frame — non-decodable
    * payloads are dropped (a curation pipeline quarantines them via
    * [[decodeFeatures]]' stub path instead). Map-only. */
  def imageDHashTable(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", StringType, nullable = false)))
    val out = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        imageDHash(r.getAs[Array[Byte]]("bytes"))
          .map(h => Row(r.getLong(0), h))
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Extracted audio-feature schema produced by `audioFeatures`. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("mean_abs", DoubleType, nullable = false)))

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * containers — no external codec libs): container format fields plus
    * the mean absolute sample amplitude on the 16-bit scale. The
    * amplitude loop honors the ACTUAL encoding — 16-bit PCM is read
    * directly; 8-bit PCM (signed or unsigned) per byte; any other
    * parseable encoding (a-law/u-law/float) is converted to PCM16 by the
    * JDK before measuring, so `mean_abs` is never garbage from
    * misinterpreted byte pairs. Reported `bits` stays the CONTAINER's
    * sample size. None when the bytes are not a parseable container or
    * the payload can't be converted. */
  private[multimodal] def audioDecode(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long, Double)] =
    // canonical PCM WAV (the dominant payload class) decodes on the
    // hand-rolled RIFF walk below; everything else (AIFF/AU, a-law,
    // u-law, float, extensible WAV) falls through to the JDK path
    riffPcmDecode(bytes).orElse(audioDecodeJdk(bytes))

  /** Hand-rolled RIFF/WAVE parse for canonical PCM (format tag 1,
    * 8/16-bit) — the decode-side mirror of [[syntheticWav]]'s
    * encode-side fix: `AudioSystem.getAudioInputStream` takes the
    * provider registry's global lock PER CALL, which serializes
    * decodes across all executor threads in one JVM (the r13 sf1
    * one-shot measured `audio_features` at isolated exponent 1.10 —
    * linear work behind a lock). Bit-identical to the JDK path for
    * this payload class: same fmt-chunk fields, n_frames =
    * dataLen/blockAlign (floored, as WaveFileReader computes it),
    * 16-bit mean over little-endian pairs, 8-bit unsigned samples
    * scaled by 256 to the 16-bit reporting scale. Returns None to
    * FALL BACK, not to reject: any structural surprise (non-PCM tag,
    * inconsistent block align, chunk overrun, truncation) defers to
    * `javax.sound` so behavior off the fast path is unchanged. */
  private[multimodal] def riffPcmDecode(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long, Double)] = {
    if (bytes.length < 12) return None
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long =
      (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
        ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def cc(o: Int): String = new String(bytes, o, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    if (cc(0) != "RIFF" || cc(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = cc(off)
      val len = u32(off + 4)
      if (off + 8 + len > bytes.length) return None
      if (id == "fmt " && len >= 16 && fmt.isEmpty)
        fmt = Some((u16(off + 8), u16(off + 10), u32(off + 12).toInt,
          u16(off + 20), u16(off + 22)))
      else if (id == "data" && data.isEmpty)
        data = Some((off + 8, len.toInt))
      // RIFF chunks pad to even byte boundaries
      off += 8 + len.toInt + (len.toInt & 1)
    }
    (fmt, data) match {
      case (Some((1, ch, rate, block, bits)), Some((dOff, dLen)))
          if ch >= 1 && rate > 0 && (bits == 16 || bits == 8) &&
            block == ch * (bits / 8) =>
        val mean =
          if (bits == 16) {
            var sum = 0.0; var n = 0; var i = dOff
            val end = dOff + dLen
            while (i + 1 < end) {
              val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xFF)).toShort
              sum += math.abs(s.toInt); n += 1; i += 2
            }
            if (n == 0) 0.0 else sum / n
          } else {
            // WAV 8-bit is PCM_UNSIGNED; scale to the 16-bit scale
            var sum = 0.0; var i = dOff
            val end = dOff + dLen
            while (i < end) {
              sum += math.abs((bytes(i) & 0xFF) - 128) * 256.0; i += 1
            }
            if (dLen == 0) 0.0 else sum / dLen
          }
        Some((rate, ch, bits, (dLen / block).toLong, mean))
      case _ => None
    }
  }

  /** The `javax.sound` decode path (AIFF/AU containers, compressed or
    * float WAV encodings the fast path defers) — see [[audioDecode]]
    * for the semantics both paths share. */
  private[multimodal] def audioDecodeJdk(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long, Double)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        val nFrames = ais.getFrameLength
        val enc = f.getEncoding
        val pcmS = javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val pcmU = javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        def mean16(data: Array[Byte], bigEndian: Boolean): Double = {
          var sum = 0.0; var n = 0; var i = 0
          while (i + 1 < data.length) {
            val s =
              if (bigEndian) ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
              else ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
            sum += math.abs(s.toInt); n += 1; i += 2
          }
          if (n == 0) 0.0 else sum / n
        }
        val meanAbs =
          if (enc == pcmS && f.getSampleSizeInBits == 16)
            mean16(ais.readAllBytes(), f.isBigEndian)
          else if ((enc == pcmS || enc == pcmU) &&
              f.getSampleSizeInBits == 8) {
            val data = ais.readAllBytes()
            var sum = 0.0; var i = 0
            while (i < data.length) {
              val s = if (enc == pcmS) data(i).toInt else (data(i) & 0xFF) - 128
              // scale 8-bit amplitude to the 16-bit reporting scale
              sum += math.abs(s) * 256.0; i += 1
            }
            if (data.length == 0) 0.0 else sum / data.length
          } else {
            // a-law / u-law / float / 24-bit …: JDK-convert to PCM16
            val target = new javax.sound.sampled.AudioFormat(
              f.getSampleRate, 16, f.getChannels, true, false)
            val conv =
              javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
            try mean16(conv.readAllBytes(), bigEndian = false)
            finally conv.close()
          }
        Some((f.getSampleRate.toInt, f.getChannels,
          f.getSampleSizeInBits, nFrames, meanAbs))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: IllegalArgumentException => None // no PCM16 conversion path
      case _: java.io.IOException => None
    }

  /** Encode a real PCM-16 WAV whose every sample is the constant
    * `value` — used by tests and the synthetic driver tables to exercise
    * the real javax.sound decode with exactly predictable features. */
  def syntheticWav(sampleRate: Int, channels: Int, nFrames: Int,
      value: Short): Array[Byte] = {
    // hand-rolled canonical 44-byte RIFF/WAVE header + PCM16-LE data:
    // byte-identical to AudioSystem.write's output for this format,
    // but free of the JDK provider registry's per-call synchronization
    // — at 50k syntheses across 32 threads the AudioSystem lock was
    // the q_audio_features bottleneck (r13 sf1 one-shot), and the
    // DECODE side (the real contract under test) still goes through
    // javax.sound untouched
    val dataLen = nFrames * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames * channels) { buf.putShort(value); i += 1 }
    buf.array()
  }

  /** Deterministic media frame of REAL WAV payloads keyed by `media_id`:
    * sample_rate = 8000 + (id % 8) * 1000, channels = 1 + id % 2,
    * n_frames = 400 + id % 100, constant sample value (= exact mean_abs)
    * = id % 2000. The derivation is the contract the DuckDB oracle for
    * `q_audio_features` predicts. */
  def synthesizeAudio(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val out = ids.select(col("media_id").cast("long"))
      // per-record encode work is CPU-bound while the ids frame is tiny:
      // partition by WORK, not bytes, or the scan coalesces to one task
      .repartition(spark.sparkContext.defaultParallelism)
      .rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = syntheticWav(8000 + (id % 8).toInt * 1000,
            1 + (id % 2).toInt, 400 + (id % 100).toInt, (id % 2000).toShort)
          Row(id, "audio", bytes, null)
        }
    }
    spark.createDataFrame(out, mediaSchema)
  }

  /** Per-partition batch audio decode — same distributed shape as
    * `decodeFeatures`, real `javax.sound` parsing. Undecodable payloads
    * are dropped (None). */
  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        audioDecode(bytes).map { case (sr, ch, bits, nf, mean) =>
          Row(id, sr, ch, bits, nf, math.rint(mean * 1e6) / 1e6)
        }
      }
    }
    spark.createDataFrame(out, audioFeatureSchema)
  }

  /** Extracted video-container-metadata schema (`videoMeta`). */
  val videoMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("duration_ticks", LongType, nullable = false),
    StructField("duration_sec", DoubleType, nullable = false)))

  /** REAL ISO-BMFF (MP4) container parse — pure byte walking, no codec:
    * top-level boxes are [size:u32][type:4cc][payload]; `moov`/`mvhd`
    * (version 0) carries the movie timescale and duration. Returns
    * (timescale, durationTicks) or None when the bytes are not a
    * parseable MP4 container. Frame DECODE stays out of reach without a
    * demuxer+codec; container metadata is what a 100 TB ingest pipeline
    * extracts per row anyway (duration filters, sampling plans). */
  private[multimodal] def mp4Meta(bytes: Array[Byte])
      : Option[(Long, Long)] = {
    def u32(off: Int): Long =
      ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    try {
      var off = 0
      while (off + 8 <= bytes.length) {
        val size32 = u32(off)
        val typ = fourcc(off + 4)
        // ISO-BMFF size encodings: 1 → 64-bit largesize follows the type
        // (standard for >4 GiB mdat); 0 → box extends to end of file
        // (legal for a final box). Both are valid, not corruption.
        val (hdrLen, size): (Int, Long) =
          if (size32 == 1L) {
            if (off + 16 > bytes.length) return None
            (16, (u32(off + 8) << 32) | u32(off + 12))
          } else if (size32 == 0L) (8, (bytes.length - off).toLong)
          else (8, size32)
        if (size < hdrLen || off + size > bytes.length) return None
        if (typ == "moov") {
          var in = off + hdrLen
          val end = off + size.toInt
          while (in + 8 <= end) {
            val s2 = u32(in)
            if (s2 < 8 || in + s2 > end) return None
            if (fourcc(in + 4) == "mvhd" && in + 8 + 20 <= end) {
              // mvhd v0: ver/flags(4) ctime(4) mtime(4) timescale(4) dur(4)
              return Some((u32(in + 8 + 12), u32(in + 8 + 16)))
            }
            in += s2.toInt
          }
          return None
        }
        off += size.toInt
      }
      None
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Encode a REAL minimal MP4 (ftyp + moov/mvhd v0) with the given
    * movie timescale and duration — structurally valid ISO-BMFF any
    * demuxer can probe, used to exercise `mp4Meta` with exactly
    * predictable metadata. */
  def syntheticMp4(timescale: Int, durationTicks: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(24 + 8 + 108)
    def cc(s: String): Unit =
      out.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(24); cc("ftyp"); cc("isom"); out.putInt(0); cc("isomiso2")
    out.putInt(8 + 108); cc("moov")
    out.putInt(108); cc("mvhd")
    out.putInt(0) // version 0 + flags
    out.putInt(0); out.putInt(0) // ctime, mtime
    out.putInt(timescale); out.putInt(durationTicks)
    out.putInt(0x00010000) // rate 1.0
    out.putShort(0x0100.toShort); out.putShort(0) // volume + reserved
    out.putInt(0); out.putInt(0) // reserved
    // unity matrix
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(out.putInt)
    (0 until 6).foreach(_ => out.putInt(0)) // pre_defined
    out.putInt(2) // next_track_ID
    out.array()
  }

  /** Deterministic media frame of REAL minimal MP4 payloads keyed by
    * `media_id`: timescale = 600 + (id % 10) * 100, duration ticks =
    * 1200 + id % 600. The DuckDB oracle for `q_video_meta` predicts
    * these plus duration_sec = ticks / timescale rounded to 6dp. */
  def synthesizeVideos(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val out = ids.select(col("media_id").cast("long"))
      // per-record encode work is CPU-bound while the ids frame is tiny:
      // partition by WORK, not bytes, or the scan coalesces to one task
      .repartition(spark.sparkContext.defaultParallelism)
      .rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = syntheticMp4(600 + (id % 10).toInt * 100,
            1200 + (id % 600).toInt)
          Row(id, "video", bytes, null)
        }
    }
    spark.createDataFrame(out, mediaSchema)
  }

  /** Per-partition batch MP4-container parse — real `mp4Meta`,
    * undecodable payloads dropped. */
  def videoMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        mp4Meta(r.getAs[Array[Byte]](1)).map { case (ts, dur) =>
          Row(id, ts, dur,
            math.rint(dur.toDouble / ts * 1e6) / 1e6)
        }
      }
    }
    spark.createDataFrame(out, videoMetaSchema)
  }

  // ---- MP4 sample tables: real stsz/stco-driven frame extraction ------

  /** Big-endian box writer: children are byte arrays, the wrapper
    * prepends [size:u32][type:4cc]. */
  private def mp4Box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val total = 8 + payload.map(_.length).sum
    val out = java.nio.ByteBuffer.allocate(total)
    out.putInt(total)
    out.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    payload.foreach(out.put)
    out.array()
  }
  private def be32(vs: Int*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(b.putInt)
    b.array()
  }
  private def be16(vs: Int*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(2 * vs.length)
    vs.foreach(v => b.putShort(v.toShort))
    b.array()
  }

  /** Encode a REAL ISO-BMFF MP4 whose `mdat` carries the given frame
    * payloads (one sample per chunk) indexed by CORRECT `stsz`/`stco`
    * sample tables, with the full standard box path
    * ftyp | mdat | moov( mvhd, trak( tkhd, mdia( mdhd, hdlr,
    * minf( vmhd, dinf/dref, stbl( stsd['png '], stts, stsc, stsz,
    * stco ))))). Layout is mdat-before-moov (the classic non-faststart
    * file order) so chunk offsets are known before the index is
    * written. Any box-walking demuxer can locate and extract the
    * samples; ours does in [[videoFrameFeatures]]. */
  def syntheticMp4WithFrames(timescale: Int, durationTicks: Int,
      frames: Seq[Array[Byte]], samplesPerChunk: Int = 1,
      forceCo64: Boolean = false): Array[Byte] = {
    require(samplesPerChunk >= 1, s"samplesPerChunk: $samplesPerChunk")
    val ftyp = mp4Box("ftyp",
      "isom".getBytes, be32(0), "isomiso2".getBytes)
    val mdat = mp4Box("mdat", frames: _*)
    // absolute file offset of each sample: ftyp + mdat header + cumsum
    val offsets = frames.scanLeft(ftyp.length + 8L)(_ + _.length).init
    val n = frames.length
    val mvhd = mp4Box("mvhd", be32(0, 0, 0, timescale, durationTicks,
      0x00010000), be16(0x0100, 0), be32(0, 0),
      be32(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000),
      be32(0, 0, 0, 0, 0, 0), be32(2))
    // nominal track/codec dims: real dims live in each frame's own
    // payload (PNG IHDR); demuxers treat these as presentation hints
    val nomDim = 16
    val tkhd = mp4Box("tkhd", be32(0x000007, 0, 0, 1, 0, durationTicks),
      be32(0, 0), be16(0, 0, 0, 0),
      be32(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000),
      be32(nomDim << 16, nomDim << 16))
    val mdhd = mp4Box("mdhd", be32(0, 0, 0, timescale, durationTicks),
      be16(0x55C4, 0)) // language 'und'
    val hdlr = mp4Box("hdlr", be32(0, 0), "vide".getBytes,
      be32(0, 0, 0), Array[Byte](0))
    val vmhd = mp4Box("vmhd", be32(0x000001), be16(0, 0, 0, 0))
    val dinf = mp4Box("dinf", mp4Box("dref", be32(0, 1),
      mp4Box("url ", be32(0x000001)))) // self-contained
    val sampleEntry = mp4Box("png ",
      Array.fill[Byte](6)(0), be16(1), // reserved + data_ref_index
      be16(0, 0), be32(0, 0, 0), // pre_defined/reserved
      be16(nomDim, nomDim), be32(0x00480000, 0x00480000, 0), be16(1),
      Array.fill[Byte](32)(0), be16(0x0018, -1)) // depth 24, pre_defined
    val stsd = mp4Box("stsd", be32(0, 1), sampleEntry)
    val stts = mp4Box("stts", be32(0, 1, n,
      if (n == 0) 0 else durationTicks / n))
    // chunking: every chunk carries samplesPerChunk samples; a short
    // final chunk gets its own stsc run (the standard encoding)
    val nChunks = if (n == 0) 0 else (n + samplesPerChunk - 1) / samplesPerChunk
    val rem = if (n == 0) 0 else n % samplesPerChunk
    val stscRuns: Seq[Int] =
      if (rem == 0 || nChunks == 1) Seq(1, samplesPerChunk.min(n.max(1)), 1)
      else Seq(1, samplesPerChunk, 1, nChunks, rem, 1)
    val stsc = mp4Box("stsc", be32(0 +: (stscRuns.length / 3) +:
      stscRuns: _*))
    val stsz = mp4Box("stsz", be32(0 +: 0 +: n +:
      frames.map(_.length): _*))
    val chunkOffsets = (0 until nChunks).map(c => offsets(c * samplesPerChunk))
    // 64-bit offsets need co64 — silently truncating to 32-bit stco
    // would corrupt the index for payloads past 2 GiB (the reader
    // handles both flavors)
    val stco =
      if (!forceCo64 && chunkOffsets.forall(_ <= Int.MaxValue))
        mp4Box("stco", be32(0 +: nChunks +: chunkOffsets.map(_.toInt): _*))
      else {
        val b = java.nio.ByteBuffer.allocate(8 + 8 * nChunks)
        b.putInt(0); b.putInt(nChunks)
        chunkOffsets.foreach(b.putLong)
        mp4Box("co64", b.array())
      }
    val stbl = mp4Box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = mp4Box("minf", vmhd, dinf, stbl)
    val mdia = mp4Box("mdia", mdhd, hdlr, minf)
    val trak = mp4Box("trak", tkhd, mdia)
    val moov = mp4Box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  /** REAL MP4 sample-table parse: descends
    * moov → trak → mdia → minf → stbl, reads `stsz` (per-sample byte
    * sizes) and `stco` (absolute chunk offsets; one-sample-per-chunk
    * and multi-sample chunks both resolve since sizes are cumulative
    * within a chunk per `stsc`'s chunk-to-sample runs). Both chunk
    * offset flavors are read — 32-bit `stco` and 64-bit `co64` — and
    * multi-sample chunks resolve each sample's offset as chunk offset +
    * cumulative size of its predecessors in the chunk, exactly the
    * demuxer algorithm. Returns per-sample (offset, size) or None when
    * the container carries no parseable sample table. */
  private[multimodal] def frameTable(bytes: Array[Byte])
      : Option[Array[(Long, Int)]] = {
    def u32(off: Int): Long =
      ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // find the first child box of `typ` within [from, to)
    def child(from: Int, to: Int, typ: String): Option[(Int, Int)] = {
      var off = from
      while (off + 8 <= to) {
        val size32 = u32(off)
        val (hdrLen, size): (Int, Long) =
          if (size32 == 1L) {
            if (off + 16 > to) return None
            (16, (u32(off + 8) << 32) | u32(off + 12))
          } else if (size32 == 0L) (8, (to - off).toLong)
          else (8, size32)
        if (size < hdrLen || off + size > to) return None
        if (fourcc(off + 4) == typ)
          return Some((off + hdrLen, off + size.toInt))
        off += size.toInt
      }
      None
    }
    try {
      val stbl = for {
        moov <- child(0, bytes.length, "moov")
        trak <- child(moov._1, moov._2, "trak")
        mdia <- child(trak._1, trak._2, "mdia")
        minf <- child(mdia._1, mdia._2, "minf")
        stbl <- child(minf._1, minf._2, "stbl")
      } yield stbl
      stbl.flatMap { case (s0, s1) =>
        val stco = child(s0, s1, "stco")
        val co64 = child(s0, s1, "co64")
        for {
          sz <- child(s0, s1, "stsz")
          co <- stco.orElse(co64)
          wide = stco.isEmpty // co64: 8-byte offsets
          fixed = u32(sz._1 + 4) // nonzero => constant sample size
          nSz = u32(sz._1 + 8).toInt
          nCo = u32(co._1 + 4).toInt
          // plausibility: samples are >= 1 byte each, so a count beyond
          // the file length is corrupt — without this, a fixed-size stsz
          // with a forged huge count would allocate the sample array
          // unchecked (the per-sample branch is implicitly bounded by
          // its own table-fits-in-box check)
          if nSz >= 0 && nCo >= 0 && nSz <= bytes.length &&
            co._1 + 8 + (if (wide) 8L else 4L) * nCo <= co._2 &&
            (fixed != 0L || sz._1 + 12 + 4L * nSz <= sz._2)
          samples <- {
            def sampleSize(i: Int): Int =
              if (fixed != 0L) fixed.toInt else u32(sz._1 + 12 + 4 * i).toInt
            def chunkOffset(c: Int): Long =
              if (wide) (u32(co._1 + 8 + 8 * c) << 32) |
                u32(co._1 + 8 + 8 * c + 4)
              else u32(co._1 + 8 + 4 * c)
            // stsc: (first_chunk, samples_per_chunk) runs; absent or
            // empty => one sample per chunk (requires nSz == nCo)
            val spcRuns: Option[Array[(Int, Int)]] =
              child(s0, s1, "stsc").flatMap { case (c0, c1) =>
                val n = u32(c0 + 4).toInt
                if (n < 0 || c0 + 8 + 12L * n > c1) None
                else Some(Array.tabulate(n)(k =>
                  (u32(c0 + 8 + 12 * k).toInt, u32(c0 + 12 + 12 * k).toInt)))
              }
            spcRuns match {
              case None | Some(Array()) =>
                if (nSz != nCo) None
                else Some(Array.tabulate(nSz)(i =>
                  (chunkOffset(i), sampleSize(i))))
              case Some(runs) =>
                // walk chunks, expanding each run's samples_per_chunk;
                // sample offset = chunk offset + sizes before it
                val out = new Array[(Long, Int)](nSz)
                var sample = 0
                var chunk = 0
                var run = 0
                var ok = true
                while (sample < nSz && chunk < nCo && ok) {
                  while (run + 1 < runs.length &&
                    chunk + 1 >= runs(run + 1)._1) run += 1
                  val spc = runs(run)._2
                  if (spc <= 0) ok = false
                  else {
                    var within = 0L
                    var k = 0
                    while (k < spc && sample < nSz) {
                      val size = sampleSize(sample)
                      out(sample) = (chunkOffset(chunk) + within, size)
                      within += size
                      sample += 1
                      k += 1
                    }
                    chunk += 1
                  }
                }
                if (ok && sample == nSz) Some(out) else None
            }
          }
        } yield samples
      }
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Extracted per-frame feature schema (`videoFrameFeatures`). */
  val frameFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)))

  /** REAL video frame-feature extraction: box-walk the MP4's
    * `stsz`/`stco` sample tables ([[frameTable]]), slice each sample's
    * byte range out of `mdat`, and decode it with the SAME ImageIO path
    * image payloads use. Frames whose payloads carry a compressed video
    * codec ImageIO cannot decode (H.264 etc. — the JDK ships no codec)
    * degrade per-frame to the labeled [[fakeDecode]] stub; files with
    * no parseable sample table yield no rows. Per-partition batch, no
    * shuffle, no collect — same distributed shape as
    * [[decodeFeatures]]. */
  def videoFrameFeatures(media: DataFrame, everyNth: Int = 1): DataFrame = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val spark = media.sparkSession
    val out = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        frameTable(bytes).toSeq.flatMap { samples =>
          samples.indices.by(everyNth).flatMap { k =>
            val (off, len) = samples(k)
            if (off < 0 || off + len > bytes.length) None
            else {
              val frame = java.util.Arrays.copyOfRange(
                bytes, off.toInt, off.toInt + len)
              val (w, h, ch, mean) = imageDecode(frame)
                .getOrElse(fakeDecode("video", frame))
              Some(Row(id, k, w, h, ch, math.rint(mean * 1e6) / 1e6))
            }
          }
        }
      }
    }
    spark.createDataFrame(out, frameFeatureSchema)
  }

  /** Deterministic media frame of REAL frame-bearing MP4 payloads keyed
    * by `media_id`: n_frames = 3 + id % 4; frame k is a uniform-gray PNG
    * with width = 8 + (id + k) % 16, height = 8 + (id + 2k) % 16, gray
    * (= exact mean intensity) = (id + 37k) % 256; movie timescale /
    * duration follow [[synthesizeVideos]]'s contract. The derivation is
    * what the DuckDB oracle for `q_frame_features` predicts. */
  def synthesizeVideosWithFrames(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val out = ids.select(col("media_id").cast("long"))
      // per-record encode work is CPU-bound while the ids frame is tiny:
      // partition by WORK, not bytes, or the scan coalesces to one task
      .repartition(spark.sparkContext.defaultParallelism)
      .rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val frames = (0 until (3 + (id % 4)).toInt).map { k =>
            syntheticPng(8 + ((id + k) % 16).toInt,
              8 + ((id + 2 * k) % 16).toInt, ((id + 37 * k) % 256).toInt)
          }
          val bytes = syntheticMp4WithFrames(600 + (id % 10).toInt * 100,
            1200 + (id % 600).toInt, frames)
          Row(id, "video", bytes, null)
        }
    }
    spark.createDataFrame(out, mediaSchema)
  }

  /** REAL animated-GIF frame decode — the codec-bearing multi-frame
    * family the JDK CAN decode end-to-end (closing the r12 gap where
    * compressed VIDEO codecs degrade to the labeled stub: H.264 needs
    * a codec the JDK doesn't ship; GIF's LZW decoder it does). One
    * ImageReader per payload, `getNumImages(allowSearch = true)` to
    * count frames, `read(k)` per frame. Frame pixels are read through
    * the COLOR MODEL (getRGB), not the raster: GIF decodes to an
    * indexed raster whose single band holds palette indices — raster
    * samples would average indices, not intensities — so channels is
    * reported as 3 (RGB through the palette) and mean intensity
    * averages r, g, b over all pixels on the 0..255 scale.
    *
    * Same distributed shape as [[videoFrameFeatures]]: per-partition
    * iterator pass, no shuffle, no collect; payloads that are not GIF
    * (or truncated mid-stream) yield no rows rather than killing the
    * job. */
  def gifFrameFeatures(media: DataFrame, everyNth: Int = 1): DataFrame = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val spark = media.sparkSession
    val out = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        gifFrames(bytes, everyNth).map { case (k, im) =>
          val (w, h) = (im.getWidth, im.getHeight)
          var sum = 0.0
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            im.getRGB(0, y, w, 1, row, 0, w)
            var i = 0
            while (i < w) {
              val p = row(i)
              sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
              i += 1
            }
            y += 1
          }
          Row(id, k, w, h, 3,
            math.rint(sum / (w.toLong * h * 3) * 1e6) / 1e6)
        }
      }
    }
    spark.createDataFrame(out, frameFeatureSchema)
  }

  /** Decode every `everyNth`-th frame of a GIF payload eagerly and
    * return (frameIndex, image) pairs; Nil when the bytes don't parse
    * as GIF. Frames that fail mid-stream (truncation) are skipped so
    * callers degrade per-frame, not per-file. Eager decode is what
    * lets the reader be DISPOSED before returning: the lazy-reader
    * shape this replaces leaked a FileCacheImageInputStream (an fd
    * plus an on-disk temp file under ImageIO's default cache) per
    * payload until JVM exit — fatal on 50k-payload sf1 runs. The
    * MemoryCacheImageInputStream wrapper also keeps the cache on-heap
    * so no temp file exists even transiently. */
  private def gifFrames(bytes: Array[Byte], everyNth: Int)
      : Seq[(Int, java.awt.image.BufferedImage)] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Nil
      val reader = readers.next()
      try {
        if (!reader.getFormatName.equalsIgnoreCase("gif")) return Nil
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        if (n <= 0) Nil
        else (0 until n by everyNth).flatMap { k =>
          (try Option(reader.read(k))
           catch { case scala.util.control.NonFatal(_) => None })
            .map(k -> _)
        }
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => Nil }
    finally iis.close()
  }

  /** Encode a real multi-frame animated GIF via the JDK writer's
    * sequence API; every frame is a uniform-gray full frame (exact
    * through GIF's 256-color palette, so decoded mean intensity ==
    * gray bit-for-bit). */
  def syntheticGif(width: Int, height: Int, grays: Seq[Int])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    grays.foreach { g =>
      val im = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g2 = im.createGraphics()
      g2.setColor(new java.awt.Color(g, g, g))
      g2.fillRect(0, 0, width, height)
      g2.dispose()
      writer.writeToSequence(
        new javax.imageio.IIOImage(im, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** Deterministic media frame of REAL animated-GIF payloads keyed by
    * `media_id`: n_frames = 2 + id % 4, width = 8 + id % 16,
    * height = 8 + (id / 16) % 16, frame k's uniform gray
    * (= exact mean intensity) = (id + 41 * k) % 256. The derivation
    * is what the DuckDB oracle for `q_gif_frames` predicts. */
  def synthesizeGifs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val out = ids.select(col("media_id").cast("long"))
      // per-record encode work is CPU-bound while the ids frame is tiny:
      // partition by WORK, not bytes, or the scan coalesces to one task
      .repartition(spark.sparkContext.defaultParallelism)
      .rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val grays = (0 until (2 + (id % 4)).toInt)
            .map(k => ((id + 41 * k) % 256).toInt)
          val bytes = syntheticGif(8 + (id % 16).toInt,
            8 + ((id / 16) % 16).toInt, grays)
          Row(id, "gif", bytes, null)
        }
    }
    spark.createDataFrame(out, mediaSchema)
  }

  /** STUB decoder for video FRAME payloads that carry a compressed
    * codec (H.264 etc. — the JDK ships no video codec; PNG/JPEG frames
    * indexed by real sample tables decode for real, see
    * [[videoFrameFeatures]]; animated GIF decodes for real via
    * [[gifFrameFeatures]]) and for image payloads ImageIO rejects.
    * PERMANENTLY ADJUDICATED (SURVEY §8): compressed video codecs stay
    * on this labeled stub in this zero-egress, no-native-codec
    * environment; the distributed plumbing around it is real and
    * exercised by the PNG-in-mdat and GIF families.
    * Deterministic in the payload bytes so tests and reruns are stable:
    * "dimensions" come from a byte-sum hash, "intensity" is the mean
    * byte value. */
  private[multimodal] def fakeDecode(kind: String, bytes: Array[Byte])
      : (Int, Int, Int, Double) = {
    val h = bytes.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xFF))
    val w = 64 + math.abs(h % 960).toInt
    val ht = 64 + math.abs((h / 960) % 960).toInt
    val ch = kind match {
      case "image" => 3
      case "audio" => 1
      case _ => 3
    }
    val mean =
      if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xFF).toDouble).sum / bytes.length
    (w, ht, ch, mean)
  }

  /** Per-partition batch decode: the Spark-side pattern for expensive
    * per-record native work — one iterator pass, no driver collect, no
    * shuffle; output is a fresh DataFrame with `featureSchema`. Images
    * go through the real ImageIO decoder; video payloads with a
    * parseable sample table report their FIRST frame's real features
    * (the pipeline-level thumbnail/probe convention); only
    * codec-bearing frames and undecodable payloads take the
    * deterministic stub. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "kind", "bytes").rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val real = kind match {
            case "image" => imageDecode(bytes)
            case "video" =>
              frameTable(bytes).filter(_.nonEmpty).flatMap { samples =>
                val (off, len) = samples(0)
                if (off < 0 || off + len > bytes.length) None
                else imageDecode(java.util.Arrays.copyOfRange(
                  bytes, off.toInt, off.toInt + len))
              }
            case _ => None
          }
          val (w, h, ch, mean) = real.getOrElse(fakeDecode(kind, bytes))
          Row(id, kind, bytes.length, w, h, ch,
            math.rint(mean * 1e6) / 1e6)
        }
    }
    spark.createDataFrame(out, featureSchema)
  }

  /** Frame-sampling plan for video payloads: rows (media_id, frame_no)
    * for every `everyNth` frame of `totalFrames` — the fan-out side of a
    * decode pipeline, pure built-ins (explode of a sequence). */
  def frameSamplePlan(media: DataFrame, totalFrames: Int, everyNth: Int)
      : DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), lit(totalFrames - 1), lit(everyNth)))
          .as("frame_no"))
}
