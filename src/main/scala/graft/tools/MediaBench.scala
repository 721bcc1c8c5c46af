package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}

/** Throughput of the REAL media decode paths (round 8: the codecs are no
  * longer stubs — `javax.imageio` + `javax.sound.sampled`), measured over
  * payloads that actually decode.
  *
  * The fixtures carry text-derived payloads (stub branch by design), so
  * this bench synthesizes DECODABLE media IN EXECUTOR TASKS — seeded
  * noise rasters encoded to PNG, seeded sine/noise PCM encoded to WAV —
  * the same no-driver-state pattern as StreamBench's rate source (a
  * driver-built corpus would serialize every payload into the task
  * binary). Payload bytes are built once per row inside `mapPartitions`
  * and carried through the exact operators under test
  * ([[Multimodal.decode]], [[Multimodal.resize]],
  * [[Multimodal.extractFeatures]], [[Multimodal.decodeAudio]]).
  *
  * Scale reading: every stage is an embarrassingly parallel per-partition
  * scan — no shuffle, no state — so docs/s here × executor count is the
  * cluster projection; the interesting number is the per-core codec cost
  * (PNG decode + re-encode dominates at ~ms/image), which bounds how many
  * cores a 100 TB media sweep needs.
  *
  * Usage: `runMain graft.tools.MediaBench [images=50000] [imageSize=128]
  * [audioClips=20000]`. Prints one `MEDIABENCH {...}` JSON line.
  */
object MediaBench {

  /** Deterministic noise PNG, built executor-side from the row id. */
  private def pngBytes(id: Long, size: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var seed = id * 0x9e3779b97f4a7c15L + 1
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, (seed >>> 40).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 1-second 8 kHz mono WAV (sine + per-id phase). */
  private def wavBytes(id: Long, rate: Int = 8000): Array[Byte] = {
    val bytes = new Array[Byte](rate * 2)
    val hz = 200.0 + (id % 200)
    var i = 0
    while (i < rate) {
      val s = (0.4 * math.sin(2 * math.Pi * hz * i / rate) * 32767).toInt
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, rate.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def synthesize(spark: SparkSession, n: Long, kind: String,
                         size: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions { ids =>
      ids.map { id =>
        val payload =
          if (kind == "image") pngBytes(id, size) else wavBytes(id)
        MediaRow(id, kind, payload,
          MediaMeta(payload.length, 0, 0, 0L, if (kind == "image") "png" else "wav"))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val nImages = if (args.length > 0) args(0).toLong else 50000L
    val imageSize = if (args.length > 1) args(1).toInt else 128
    val nAudio = if (args.length > 2) args(2).toLong else 20000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-mediabench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Synthesis cost is measured separately and subtracted per stage:
    // every stage below re-synthesizes its input in the same scan (the
    // payloads never materialize anywhere), so stage time = synth + op.
    def time(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val rows = body
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    def bench(label: String, rows: Long, opSec: Double): (String, Long) = {
      // a non-positive op time means the synthesis baseline measured
      // SLOWER than the synth+op stage (JIT/page-cache variance): the
      // subtraction is invalid — report -1 rather than an absurd rate
      label -> (if (opSec <= 0) -1L else (rows / opSec).round)
    }

    val images = synthesize(spark, nImages, "image", imageSize)
    val audio = synthesize(spark, nAudio, "audio", 0)
    // warmup: JIT + codec registry + codegen
    Multimodal.decode(synthesize(spark, 2000, "image", imageSize)).count()
    Multimodal.decodeAudio(synthesize(spark, 1000, "audio", 0)).count()

    val (_, synthImgSec) = time(images.count())
    val (_, synthAudSec) = time(audio.count())
    val (dRows, dSec) = time(Multimodal.decode(images).count())
    val (rRows, rSec) = time(Multimodal.resize(images, 64, 64).count())
    val (fRows, fSec) = time(
      Multimodal.extractFeatures(images, dim = 8).count())
    val (aRows, aSec) = time(Multimodal.decodeAudio(audio).count())

    val stages = Seq(
      bench("decode_images_per_sec", dRows, dSec - synthImgSec),
      bench("resize_images_per_sec", rRows, rSec - synthImgSec),
      bench("features_images_per_sec", fRows, fSec - synthImgSec),
      bench("decode_audio_clips_per_sec", aRows, aSec - synthAudSec))
    val payload = stages.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""MEDIABENCH {"images":$nImages,"image_px":$imageSize,"audio_clips":$nAudio,"synth_images_per_sec":${(nImages / synthImgSec).round},$payload,"cpus":$cpus}""")
    spark.stop()
  }
}
