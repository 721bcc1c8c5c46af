package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media as opaque `binary` payloads + typed metadata, with
  * decode / feature-extract / resize / frame-sample as per-partition
  * operators.
  *
  * IMAGE and AUDIO decode are REAL as of round 8, zero added
  * dependencies: `javax.imageio` (JPEG/PNG/GIF/BMP — true dimensions,
  * raster-pixel hashes, `Graphics2D` bilinear resize, per-channel
  * mean/std features) and `javax.sound.sampled` (WAV/AIFF 16-bit PCM —
  * true sample rate/channels/frames, RMS + peak loudness). Payloads no
  * registered codec accepts (including the text-derived fixture bytes)
  * fall back to the DETERMINISTIC STUB (md5-derived pseudo-values,
  * clearly marked below), so fixture oracles are content-independent
  * while the specs exercise the real codecs on an embedded PNG and a
  * generated sine WAV. VIDEO has no in-JDK codec and remains stubbed,
  * with the binary column schema, typed-metadata struct, `mapPartitions`
  * batch shape and partition sizing as the real Spark plumbing a
  * codec-backed implementation drops into.
  *
  * Scale notes:
  *  - Payloads stay opaque `BinaryType`: parquet stores them as byte arrays
  *    with column pruning, so metadata-only queries never read the bytes.
  *  - Decode-class operators run via `mapPartitions` on a typed Dataset:
  *    one codec/context initialization per PARTITION (not per row) — the
  *    same amortization `mapInPandas` batches give Python codecs.
  *  - Media skews hugely in size; [[repartitionForDecode]] spreads payloads
  *    round-robin so one partition doesn't hold all the 4K videos.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  case class MediaMeta(byte_len: Int, width: Int, height: Int,
                       duration_ms: Long, format: String)

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      meta: MediaMeta)

  case class DecodedRow(media_id: Long, kind: String, byte_len: Int,
                        content_hash: String, width: Int, height: Int)

  case class MediaFeatures(media_id: Long, features: Array[Double])

  case class Frame(media_id: Long, frame_no: Int, frame_hash: String)

  /** Decoded audio facts: stream geometry + the two loudness statistics
    * (RMS and peak of the normalized signal) a corpus-quality gate needs
    * to drop silent/clipped clips before feature extraction. */
  case class AudioInfo(media_id: Long, sample_rate: Int, channels: Int,
                       frames: Long, duration_ms: Long, rms: Double,
                       peak: Double)

  /** Synthesize a deterministic media table from the `documents` fixture:
    * payload = UTF-8 bytes of the text, kind cycles image/audio/video,
    * fake-but-deterministic dimensions derived from (id, byte_len). This is
    * the fixture-side stand-in for `spark.read.format("binaryFile")` or a
    * parquet lake of media blobs. */
  def mediaTable(docs: DataFrame): DataFrame = {
    val len = length(col("text"))
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        len.cast("int").as("byte_len"),
        (lit(64) + pmod(col("doc_id"), lit(1024))).cast("int").as("width"),
        (lit(64) + pmod(len.cast("long"), lit(768))).cast("int").as("height"),
        (len.cast("long") * 40L).as("duration_ms"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"))
        .as("meta"))
  }

  /** Round-robin repartition before decode: payload sizes are heavy-tailed,
    * and hash-partitioning by id can still leave size skew; round-robin
    * bounds per-partition byte volume for the codec stage. */
  def repartitionForDecode(media: DataFrame, partitions: Int): DataFrame =
    media.repartition(partitions)

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Container magic-byte pre-checks — the 100× scaling run measured the
    * FAILED codec probe as the hot path (every undecodable payload paid a
    * full `AudioSystem` provider scan + exception, ~320 µs/row; ImageIO's
    * reader iteration is cheaper but same shape). At 100 TB almost every
    * byte a media sweep touches is the common case, so rejection must be
    * O(4 bytes). Covers the magic-bearing containers the base JDK
    * decodes — PNG/JPEG/GIF/BMP, WAV(RIFF)/AIFF(FORM)/AU(.snd); WBMP is
    * deliberately outside the gate (see [[tryDecodeImage]]). */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length > 8 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte && p(2) == 0xff.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 'B' && p(1) == 'M'))

  private def looksLikeAudio(p: Array[Byte]): Boolean =
    p.length > 12 && (
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') ||
      (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M') ||
      (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'))

  /** REAL image decode via the in-JDK `javax.imageio` registry, gated by
    * [[looksLikeImage]]: PNG/JPEG/GIF/BMP payloads decode; `None` for
    * everything else — corrupt payloads, the text-derived fixtures, and
    * (deliberately) WBMP, whose headerless format has no magic to gate on
    * and whose reader would otherwise "accept" arbitrary bytes. Callers
    * route `None` to the deterministic stub — `errors.tolerance`-style
    * skip-don't-crash handling a 100 TB media sweep needs (one bad blob
    * must not fail a 512 MB task). */
  private[operators] def tryDecodeImage(
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(payload)) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None }

  /** Codec-independent content hash of a decoded image: md5 over the
    * ARGB raster (row-major), so two encodings of the same pixels hash
    * identically — the property exact-dedup over decoded media needs. */
  private[operators] def pixelHash(img: java.awt.image.BufferedImage): String = {
    val (w, h) = (img.getWidth, img.getHeight)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val bb = java.nio.ByteBuffer.allocate(px.length * 4)
    px.foreach(bb.putInt)
    md5Hex(bb.array)
  }

  /** Decode: one codec init per partition, then per-row decode. Images
    * go through the REAL `javax.imageio` path — true width/height and a
    * raster-pixel content hash. Non-image kinds and undecodable payloads
    * take the STUB branch (md5 of the raw bytes, metadata dimensions),
    * deterministic and oracle-checkable. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec initialization happens here (amortized);
      // ImageIO's reader registry is also warmed by the first decode
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { m =>
        val real =
          if (m.kind == "image") tryDecodeImage(m.payload) else None
        real match {
          case Some(img) =>
            DecodedRow(m.media_id, m.kind, m.payload.length,
              pixelHash(img), img.getWidth, img.getHeight)
          case None => // >>> STUB fallback: undecodable bytes <<<
            digest.reset()
            val hash = digest.digest(m.payload).map("%02x".format(_)).mkString
            DecodedRow(m.media_id, m.kind, m.payload.length, hash,
              m.meta.width, m.meta.height)
        }
      }
    }
  }

  /** Feature extraction: payload → fixed-width vector in [0,1]. Decodable
    * images get REAL per-channel statistics — mean(R,G,B), std(R,G,B) and
    * the two aspect fractions w/(w+h), h/(w+h) — the normalization stats
    * a vision pipeline computes before training; `dim` ≠ 8 cycles that
    * base vector. Everything else takes the STUB branch (md5-derived
    * bytes scaled to [0,1]), preserving batch shape and schema. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val real =
          if (m.kind == "image") tryDecodeImage(m.payload) else None
        val fs = real match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val n = px.length.toDouble
            val sums = new Array[Double](3); val sqs = new Array[Double](3)
            px.foreach { p =>
              val c = Array((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
              var i = 0
              while (i < 3) {
                val v = c(i) / 255.0
                sums(i) += v; sqs(i) += v * v; i += 1
              }
            }
            val means = sums.map(_ / n)
            val stds = (0 until 3).map(i =>
              math.sqrt(math.max(0.0, sqs(i) / n - means(i) * means(i))))
            val base = means.toIndexedSeq ++ stds ++
              Seq(w.toDouble / (w + h), h.toDouble / (w + h))
            Array.tabulate(dim)(j => base(j % base.length))
          case None => // >>> STUB fallback: no in-JDK audio/video codec <<<
            val hex = md5Hex(m.payload)
            Array.tabulate(dim)(j =>
              Integer.parseInt(hex.substring(j * 2, j * 2 + 2), 16) / 255.0)
        }
        MediaFeatures(m.media_id, fs)
      }
    }
  }

  /** REAL audio decode via the in-JDK `javax.sound.sampled` (WAV/AIFF/AU
    * parsers ship with every JDK). `None` when the bytes aren't a
    * parseable audio container or the encoding isn't 16-bit signed PCM —
    * callers route those to the deterministic stub, the same
    * skip-don't-crash contract as [[tryDecodeImage]]. */
  private[operators] def tryDecodeAudio(payload: Array[Byte])
      : Option[javax.sound.sampled.AudioInputStream] =
    if (!looksLikeAudio(payload)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val f = in.getFormat
      if (f.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16 && in.getFrameLength > 0) Some(in)
      else None
    } catch { case _: Exception => None }

  /** Audio decode: WAV/AIFF payloads of kind `audio` go through the REAL
    * `javax.sound.sampled` path — true sample rate / channel count /
    * frame length, and RMS + peak computed over the normalized 16-bit PCM
    * signal (the loudness stats silence/clipping gates cut on).
    * Undecodable payloads (the text-derived fixtures) take the STUB
    * branch: 16 kHz mono, frames = byte length, and rms/peak as the
    * min/max of two md5-derived bytes scaled to [0,1] (min/max so the
    * rms ≤ peak invariant real audio guarantees also holds for stubs) —
    * deterministic and oracle-expressible in DuckDB. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioInfo] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.map { m =>
        tryDecodeAudio(m.payload) match {
          case Some(in) =>
            val f = in.getFormat
            val frames = in.getFrameLength
            val bytes = in.readAllBytes()
            val n = bytes.length / 2
            var sumSq = 0.0; var peak = 0.0; var i = 0
            while (i < n) {
              val lo = bytes(2 * i); val hi = bytes(2 * i + 1)
              val raw =
                if (f.isBigEndian) ((lo << 8) | (hi & 0xff)).toShort
                else ((hi << 8) | (lo & 0xff)).toShort
              val s = raw / 32768.0
              sumSq += s * s
              if (math.abs(s) > peak) peak = math.abs(s)
              i += 1
            }
            val rate = f.getSampleRate.toInt
            AudioInfo(m.media_id, rate, f.getChannels, frames,
              frames * 1000L / rate,
              math.sqrt(if (n > 0) sumSq / n else 0.0), peak)
          case None => // >>> STUB fallback: undecodable bytes <<<
            val hex = md5Hex(m.payload)
            val a = Integer.parseInt(hex.substring(0, 2), 16) / 255.0
            val b = Integer.parseInt(hex.substring(2, 4), 16) / 255.0
            AudioInfo(m.media_id, 16000, 1, m.payload.length.toLong,
              m.meta.duration_ms, math.min(a, b), math.max(a, b))
        }
      }
    }
  }

  /** Frame sampling: video payloads fan out to one row per sampled frame
    * (1 frame/second of fake duration, capped). The `flatMap` shape — one
    * input row, many output rows — is the real contract; the frame
    * "content" is a STUB hash of (payload md5, frame_no). */
  def sampleFrames(media: Dataset[MediaRow], maxFrames: Int = 5): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.min((m.meta.duration_ms / 1000L).toInt, maxFrames)
      val base = md5Hex(m.payload)
      (0 until n).map(i => Frame(m.media_id, i, md5Hex(s"$base:$i".getBytes("UTF-8"))))
    }
  }

  /** Resize: REAL decode → `Graphics2D` bilinear scale for decodable
    * images (content_hash = raster hash of the RESIZED pixels; a
    * production sink would `ImageIO.write` the scaled raster back to
    * bytes in the same loop). Undecodable payloads keep the
    * deterministic STUB rehash so fixture runs stay content-stable. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { m =>
        tryDecodeImage(m.payload) match {
          case Some(img) =>
            val dst = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            DecodedRow(m.media_id, m.kind, m.payload.length,
              pixelHash(dst), w, h)
          case None => // >>> STUB fallback: undecodable bytes <<<
            val rehash =
              md5Hex(s"${md5Hex(m.payload)}:${w}x$h".getBytes("UTF-8"))
            DecodedRow(m.media_id, m.kind, m.payload.length, rehash, w, h)
        }
      }
    }
  }

  /** Typed view of [[mediaTable]] for the partition-wise operators. */
  def asMediaRows(media: DataFrame): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.as[MediaRow]
  }
}
