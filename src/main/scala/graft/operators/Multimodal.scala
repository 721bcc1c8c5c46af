package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media as opaque `binary` payloads + typed metadata, with
  * decode / feature-extract / resize / frame-sample as per-partition
  * operators.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (md5-derived pseudo-features, clearly marked below);
  * everything around it — the binary column schema, the typed-metadata
  * struct, the `mapPartitions` batch shape, the partition sizing — is the
  * real Spark plumbing a codec-backed implementation would drop into.
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

  /** Decode: one codec init per partition, then per-row header parse.
    * >>> STUB: a real implementation hands `payload` to an image/audio
    * decoder here; this one derives `content_hash` (md5) and echoes the
    * metadata dimensions, which is deterministic and oracle-checkable. <<< */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec" initialization happens here (amortized)
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { m =>
        digest.reset()
        val hash = digest.digest(m.payload).map("%02x".format(_)).mkString
        DecodedRow(m.media_id, m.kind, m.payload.length, hash,
          m.meta.width, m.meta.height)
      }
    }
  }

  /** Feature extraction: payload → fixed-width embedding.
    * >>> STUB: real code runs a vision/audio encoder per batch; this one
    * derives `dim` doubles from the payload md5 (byte j scaled to [0,1]),
    * preserving the batch shape and output schema. <<< */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val hex = md5Hex(m.payload)
        val fs = Array.tabulate(dim)(j =>
          Integer.parseInt(hex.substring(j * 2, j * 2 + 2), 16) / 255.0)
        MediaFeatures(m.media_id, fs)
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

  /** Resize: new dimensions + a deterministic STUB of the resized content
    * (real code: decode → scale → re-encode per partition). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { m =>
        val rehash = md5Hex(s"${md5Hex(m.payload)}:${w}x$h".getBytes("UTF-8"))
        DecodedRow(m.media_id, m.kind, m.payload.length, rehash, w, h)
      }
    }
  }

  /** Typed view of [[mediaTable]] for the partition-wise operators. */
  def asMediaRows(media: DataFrame): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.as[MediaRow]
  }
}
