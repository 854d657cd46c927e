package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads travel as opaque
  * `binary` columns beside a typed metadata struct, parquet-native.
  *
  * Decoding is a batched per-partition pass (one decoder context per
  * partition, rows streamed through it — the Scala analogue of a
  * pandas-batch UDF). Two decoders are provided:
  *
  *  - a REAL image path on JDK `javax.imageio` (PNG / JPEG / BMP /
  *    GIF — including multi-frame GIF demux for frame sampling), no
  *    external native libs required;
  *  - a deterministic byte-arithmetic stub for payloads that aren't
  *    decodable images (e.g. the text corpus used by the oracle
  *    queries), so every payload gets a defined, reproducible result.
  *
  * The `decoder` argument selects `"auto"` (sniff magic bytes, decode
  * real images, stub everything else — the default), `"image"`
  * (attempt real decode on every row), or `"stub"` (byte arithmetic
  * only — the cross-engine-reproducible oracle path).
  */
object Multimodal {

  val Auto = "auto"
  val Image = "image"
  val Stub = "stub"

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType))))))

  /** Demo ingestion: wrap a text column as a binary payload with
    * metadata (stands in for reading image bytes from object store).
    */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("text/plain").as("format"),
        octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** PNG / JPEG / GIF / BMP magic-byte sniff — lets the auto decoder
    * skip the ImageIO reader lookup entirely on non-image payloads, so
    * a mixed corpus pays the real-decode cost only for real images.
    */
  private[ops] def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p(0) == 0xff.toByte && p(1) == 0xd8.toByte && p(2) == 0xff.toByte) ||
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
        (p(0) == 'B' && p(1) == 'M'))

  /** 8-dim image feature: mean R, G, B, mean luma of the four
    * quadrants (coarse spatial signature), and aspect w/(w+h) — all in
    * [0, 1]. Row-bulk getRGB keeps per-pixel overhead down.
    */
  private[ops] def featurize(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    var sr, sg, sb = 0L
    val qLuma = new Array[Long](4)
    val qN = new Array[Long](4)
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      val rowQ = if (y * 2 >= h) 2 else 0
      var x = 0
      while (x < w) {
        val rgb = rowBuf(x)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val qi = rowQ + (if (x * 2 >= w) 1 else 0)
        qLuma(qi) += (r * 299 + g * 587 + b * 114) / 1000
        qN(qi) += 1
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toFloat
    Array(
      sr / n / 255f, sg / n / 255f, sb / n / 255f,
      qLuma(0).toFloat / math.max(1L, qN(0)) / 255f,
      qLuma(1).toFloat / math.max(1L, qN(1)) / 255f,
      qLuma(2).toFloat / math.max(1L, qN(2)) / 255f,
      qLuma(3).toFloat / math.max(1L, qN(3)) / 255f,
      w.toFloat / (w + h))
  }

  /** Real image decode via JDK ImageIO; None when the payload isn't a
    * decodable image (caller falls back to the stub).
    */
  private[ops] def imageDecode(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    if (!looksLikeImage(payload)) None
    else
      try {
        Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload)))
          .map(img => (img.getWidth, img.getHeight, featurize(img)))
      } catch { case _: java.io.IOException => None }

  /** Deterministic stub for non-image payloads: "dimensions" and a
    * tiny "feature vector" derived from the bytes, so the pipeline
    * shape is exercised end-to-end on any corpus and the oracle
    * queries stay cross-engine reproducible.
    */
  private def stubDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 64 + (n % 512)
    val height = 64 + ((n * 7) % 512)
    val feature = Array.tabulate(8) { i =>
      (if (n == 0) 0f else payload(i % n).toFloat / 255f)
    }
    (width, height, feature)
  }

  private def decodeOne(payload: Array[Byte], decoder: String): (Int, Int, Array[Float]) =
    decoder match {
      case Stub => stubDecode(payload)
      case _ => imageDecode(payload).getOrElse(stubDecode(payload))
    }

  /** Batched per-partition decode pass. One decoder context per
    * partition (ImageIO's disk cache is disabled once per partition —
    * decode stays in-memory), rows streamed through — the
    * Spark-idiomatic shape for expensive-per-record multimodal work.
    */
  def decodeFeatures(
      spark: SparkSession,
      media: DataFrame,
      decoder: String = Auto): DataFrame = {
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val (w, h, feat) = decodeOne(payload, decoder)
        Row(id, w, h, payload.length.toLong, feat.toSeq)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("thumb", BinaryType)))

  val pHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("ahash_lo", LongType),
    StructField("ahash_hi", LongType)))

  /** 64-bit average perceptual hash packed as two unsigned 32-bit
    * halves (no sign-bit ambiguity cross-engine): cell value > grand
    * mean ⇒ bit set. All arithmetic is integer (luma in 0..255000,
    * integer cell/grand means), so the hash is bit-stable across
    * JVMs and replicable in SQL for the stub path.
    */
  private def packAHash(vals: Array[Long]): (Long, Long) = {
    val mean = vals.sum / 64
    var lo = 0L; var hi = 0L
    var i = 0
    while (i < 32) { if (vals(i) > mean) lo |= 1L << i; i += 1 }
    while (i < 64) { if (vals(i) > mean) hi |= 1L << (i - 32); i += 1 }
    (lo, hi)
  }

  /** Real image aHash: per-cell integer luma sums over an 8×8 grid
    * computed directly from pixels (integer cell assignment
    * `(8y/h, 8x/w)` — no interpolated rescale, so the hash does not
    * depend on a JDK's drawImage implementation), integer means,
    * mean-threshold bits. The standard near-dup fingerprint for
    * images: a re-encoded / slightly-resized copy keeps ~all 64 bits.
    */
  private[ops] def imageAHash(payload: Array[Byte]): Option[(Long, Long)] =
    if (!looksLikeImage(payload)) None
    else
      try {
        Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload)))
          .map { img =>
            val w = img.getWidth; val h = img.getHeight
            val sums = new Array[Long](64)
            val cnts = new Array[Long](64)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val luma = 299L * ((rgb >> 16) & 0xFF) +
                  587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
                val c = (y * 8 / h) * 8 + (x * 8 / w)
                sums(c) += luma; cnts(c) += 1
                x += 1
              }
              y += 1
            }
            packAHash(Array.tabulate(64)(i =>
              if (cnts(i) == 0) 0L else sums(i) / cnts(i)))
          }
      } catch { case _: java.io.IOException => None }

  /** Stub aHash over raw payload bytes (cell i = byte i mod n) — the
    * deterministic cross-engine-replicable path for non-image
    * payloads, same discipline as the decode stub.
    */
  private def stubAHash(payload: Array[Byte]): (Long, Long) = {
    val n = payload.length
    packAHash(Array.tabulate(64)(i =>
      if (n == 0) 0L else (payload(i % n) & 0xFF).toLong))
  }

  /** Perceptual-hash pass: (media_id, ahash_lo, ahash_hi). Image
    * near-dup pairs then come from the SimHash banding machinery over
    * the 64-bit fingerprint — blocking on hash prefixes, popcount
    * verify — exactly as for text.
    */
  def perceptualHash(
      spark: SparkSession,
      media: DataFrame,
      decoder: String = Auto): DataFrame = {
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val (lo, hi) =
          if (decoder == Stub) stubAHash(payload)
          else imageAHash(payload).getOrElse(stubAHash(payload))
        Row(id, lo, hi)
      }
    }
    spark.createDataFrame(rdd, pHashSchema)
  }

  /** Real rescale: decode, bilinear-draw into a (targetW × targetH)
    * RGB canvas, re-encode as PNG. Returns None for undecodable
    * payloads.
    */
  private[ops] def imageResize(
      payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    if (!looksLikeImage(payload)) None
    else
      try {
        Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))).map { img =>
          val out = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
      } catch { case _: java.io.IOException => None }

  /** Thumbnail pass: real decode + bilinear rescale + PNG re-encode
    * for image payloads; for anything else a deterministic stride
    * downsample of the byte stream. Both preserve the real pipeline
    * property — output payloads bounded by the target dimensions
    * regardless of input size.
    */
  def resize(
      spark: SparkSession,
      media: DataFrame,
      targetW: Int,
      targetH: Int,
      decoder: String = Auto): DataFrame = {
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val real =
          if (decoder == Stub) None else imageResize(payload, targetW, targetH)
        val thumb = real.getOrElse {
          val budget = targetW * targetH
          if (payload.length <= budget) payload
          else {
            val stride = payload.length / budget
            Array.tabulate(budget)(i => payload(i * stride))
          }
        }
        Row(id, targetW, targetH, thumb)
      }
    }
    spark.createDataFrame(rdd, resizedSchema)
  }

  val framesSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_feature", ArrayType(FloatType))))

  /** Real frame demux for multi-frame containers ImageIO can read
    * (animated GIF): every `everyN`-th frame decoded and featurized.
    * None when no ImageIO reader claims the payload.
    */
  private[ops] def imageFrames(
      payload: Array[Byte], everyN: Int): Option[Seq[(Int, Array[Float])]] =
    if (!looksLikeImage(payload)) None
    else {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            Some((0 until n by everyN).map(f => f -> featurize(reader.read(f))))
          } catch {
            case _: java.io.IOException => None
          } finally reader.dispose()
        }
      } finally iis.close()
    }

  /** Frame sampling: real demux for animated-image payloads (one row
    * per sampled frame); for other payloads each `frameBytes`-sized
    * slice stands in as one "frame" — the schema and explode shape a
    * video pipeline needs, defined for any corpus.
    */
  def sampleFrames(
      spark: SparkSession,
      media: DataFrame,
      frameBytes: Int = 64,
      everyN: Int = 2,
      decoder: String = Auto): DataFrame = {
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val real =
          if (decoder == Stub) None else imageFrames(payload, everyN)
        val frames = real.getOrElse {
          val nFrames = payload.length / frameBytes
          (0 until nFrames by everyN).map { f =>
            val slice = payload.slice(f * frameBytes, (f + 1) * frameBytes)
            f -> stubDecode(slice)._3
          }
        }
        frames.map { case (f, feat) => Row(id, f, feat.toSeq) }
      }
    }
    spark.createDataFrame(rdd, framesSchema)
  }

  // --- audio ----------------------------------------------------------

  val audioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("loudness", ArrayType(FloatType))))

  /** RIFF/WAVE magic-byte sniff (bytes 0-3 "RIFF", 8-11 "WAVE"). */
  private[ops] def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** 8-dim audio feature: RMS loudness of 8 equal time windows over
    * the mono mixdown, each in [0, 1] for samples normalized to
    * [-1, 1] — the coarse loudness envelope audio curation filters
    * key on (silence/clipping detection, energy balance).
    */
  private[ops] def audioFeaturize(samples: Array[Float]): Array[Float] = {
    val k = 8
    val out = new Array[Float](k)
    val n = samples.length
    var w = 0
    while (w < k && n > 0) {
      val s = (w.toLong * n / k).toInt
      val e = math.min(n, math.max(s + 1, ((w + 1).toLong * n / k).toInt))
      var acc = 0.0
      var i = s
      while (i < e) { acc += samples(i).toDouble * samples(i); i += 1 }
      out(w) = if (e <= s) 0f else math.sqrt(acc / (e - s)).toFloat
      w += 1
    }
    out
  }

  /** Real WAV decode via JDK `javax.sound.sampled` (PCM 8/16-bit,
    * mono or multi-channel, either endianness — no native libs).
    * Channels are averaged to a mono stream for the loudness
    * envelope. None when the payload isn't a decodable PCM WAV
    * (caller falls back to the stub).
    */
  private[ops] def audioDecode(
      payload: Array[Byte]): Option[(Int, Int, Long, Array[Float])] =
    decodedMono(payload).map { case (sr, ch, mono) =>
      (sr, ch, mono.length.toLong, audioFeaturize(mono))
    }

  /** (sampleRate, channels, mono mixdown) — the shared decode core of
    * [[audioDecode]] and [[audioClips]].
    */
  private[ops] def decodedMono(
      payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    if (!looksLikeWav(payload)) None
    else
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(payload))
        try {
          val f = ais.getFormat
          val signed =
            f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned =
            f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val bits = f.getSampleSizeInBits
          val frameSize = f.getFrameSize
          if ((!signed && !unsigned) || (bits != 8 && bits != 16) || frameSize <= 0)
            None
          else {
            val bytes = ais.readAllBytes()
            val ch = f.getChannels
            val perSample = bits / 8
            val nFrames = bytes.length / frameSize
            val mono = new Array[Float](nFrames)
            var i = 0
            while (i < nFrames) {
              var acc = 0.0
              var c = 0
              while (c < ch) {
                val off = i * frameSize + c * perSample
                val v =
                  if (bits == 8) {
                    if (signed) bytes(off) / 128.0
                    else ((bytes(off) & 0xff) - 128) / 128.0
                  } else {
                    val b0 = bytes(off + (if (f.isBigEndian) 1 else 0)) & 0xff
                    val b1 = bytes(off + (if (f.isBigEndian) 0 else 1)) & 0xff
                    val raw = (b1 << 8) | b0
                    if (signed) raw.toShort / 32768.0
                    else (raw - 32768) / 32768.0
                  }
                acc += v
                c += 1
              }
              mono(i) = (acc / ch).toFloat
              i += 1
            }
            Some((f.getSampleRate.toInt, ch, mono))
          }
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }

  /** Deterministic stub for non-audio payloads, mirroring the image
    * stub's byte arithmetic so the oracle replicates it exactly
    * (ASCII corpus bound documented at the oracle SQL).
    */
  private def stubAudio(payload: Array[Byte]): (Int, Int, Long, Array[Float]) = {
    val n = payload.length
    val feat = Array.tabulate(8) { i =>
      (if (n == 0) 0f else payload((i * 5) % n).toFloat / 255f)
    }
    (8000 + n % 8000, 1 + n % 2, n.toLong, feat)
  }

  /** Batched per-partition audio decode: real PCM WAV payloads get
    * the true (rate, channels, frames, loudness envelope); everything
    * else the deterministic stub — same contract as
    * [[decodeFeatures]] for images.
    */
  def decodeAudio(
      spark: SparkSession,
      media: DataFrame,
      decoder: String = Auto): DataFrame = {
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val real = if (decoder == Stub) None else audioDecode(payload)
        val (sr, ch, ns, feat) = real.getOrElse(stubAudio(payload))
        Row(id, sr, ch, ns, feat.toSeq)
      }
    }
    spark.createDataFrame(rdd, audioSchema)
  }

  val clipSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("clip_idx", IntegerType),
    StructField("n_samples", LongType),
    StructField("rms", FloatType)))

  /** Real clip segmentation: decode once, then one (clip_idx, RMS)
    * row per `clipSamples`-frame span of the mono mixdown — what a
    * speech pipeline segments before feature extraction, and the
    * input a silence-trim filter keys on. None for non-PCM payloads.
    */
  private[ops] def audioClips(
      payload: Array[Byte], clipSamples: Int): Option[Seq[(Int, Long, Float)]] =
    audioMono(payload).map { mono =>
      mono.grouped(clipSamples).zipWithIndex.map { case (clip, idx) =>
        var acc = 0.0
        var i = 0
        while (i < clip.length) { acc += clip(i).toDouble * clip(i); i += 1 }
        (idx, clip.length.toLong, math.sqrt(acc / math.max(1, clip.length)).toFloat)
      }.toSeq
    }

  /** Decoded mono mixdown, shared by [[audioDecode]] and [[audioClips]]. */
  private[ops] def audioMono(payload: Array[Byte]): Option[Array[Float]] =
    decodedMono(payload).map(_._3)

  /** Clip sampling over a media column: real segmentation for PCM WAV
    * payloads; for other payloads each `clipBytes`-sized byte slice
    * stands in as one "clip" with the stub's byte-RMS — the explode
    * shape an audio pipeline needs, defined for any corpus (mirror of
    * [[sampleFrames]] for video).
    */
  def sampleClips(
      spark: SparkSession,
      media: DataFrame,
      clipSamples: Int = 2048,
      clipBytes: Int = 64,
      decoder: String = Auto): DataFrame = {
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val real = if (decoder == Stub) None else audioClips(payload, clipSamples)
        val clips = real.getOrElse {
          // stub: whole clipBytes-sized slices only (floor), byte-RMS
          // via an EXACT integer sum of squares, divided and rooted
          // once — single rounding point, so the oracle replicates it
          // bit-for-bit
          val nClips = payload.length / clipBytes
          (0 until nClips).map { cIdx =>
            var ssum = 0L
            var i = cIdx * clipBytes
            while (i < (cIdx + 1) * clipBytes) {
              val b = payload(i).toLong
              ssum += b * b
              i += 1
            }
            (cIdx, clipBytes.toLong,
              math.sqrt(ssum.toDouble / (65025.0 * clipBytes)).toFloat)
          }
        }
        clips.map { case (cIdx, ns, rms) => Row(id, cIdx, ns, rms) }
      }
    }
    spark.createDataFrame(rdd, clipSchema)
  }
}
