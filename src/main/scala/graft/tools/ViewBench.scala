package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{HistogramStream, HllViewStream}

/** Scale certification for the two pure-merge streaming views —
  * [[HistogramStream]] (grid percentiles) and [[HllViewStream]]
  * (distinct counts): drive each over the events fixture split into
  * deterministic microbatches and report the per-batch latency curve.
  * Both folds are order-free appends of batch-local aggregates, so the
  * pass criterion is a FLAT curve: per-batch cost must track the batch's
  * own group occupancy, never the store's age (compaction keeps the
  * store bounded; the replay-guard max-scan reads the tiny store only).
  *
  * Usage: `runMain graft.tools.ViewBench [sfDir=/root/testdata/sf0.1]
  * [compactEvery=4] [maxFilesPerTrigger=1]` → one `VIEWBENCH {...}` JSON
  * line. Point `sfDir` at a [[ScaleUp]] replica for the 10×/100× runs. */
object ViewBench {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val compactEvery = if (args.length > 1) args(1).toInt else 4
    val filesPerTrigger = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-viewbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the progress ledger IS the measurement: default cap is 100 entries,
      // a >100-batch run would silently drop its earliest batches from the
      // reported curve and totals (round-12 self-review)
      .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val static = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"),
        col("user_id").cast("string").as("user"))
    val nRows = static.count()
    val b = static.agg(min(col("value")), max(col("value"))).head()
    val (mn, mx) = (b.getDouble(0), b.getDouble(1))
    // one parquet drop so the stream reads executor-side with
    // deterministic batch boundaries (the fixture is a single file)
    val base = java.nio.file.Files.createTempDirectory("graft-viewbench").toString
    static.repartition(20).write.parquet(s"$base/in")

    def drive(label: String)
             (startQ: org.apache.spark.sql.DataFrame => org.apache.spark.sql.streaming.StreamingQuery)
        : (Array[(Long, Double)], Double) = {
      val rows = spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", filesPerTrigger)
        .parquet(s"$base/in")
      println(s"[viewbench] driving $label fold over $nRows rows")
      val t0 = System.nanoTime()
      val q = startQ(rows)
      try {
        q.processAllAvailable()
        q.exception.foreach(throw _)
      } finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      (q.recentProgress.filter(_.numInputRows > 0)
        .map(p => (p.numInputRows,
          p.durationMs.get("triggerExecution").toLong / 1000.0)),
        wall)
    }

    val (histCurve, histWall) = drive("hist") { rows =>
      HistogramStream.start(rows, s"$base/hist_state", s"$base/hist_ckpt",
        "event_type", "value", mn, mx, compactEvery = compactEvery)
    }
    val (hllCurve, hllWall) = drive("hll") { rows =>
      HllViewStream.start(rows, s"$base/hll_state", s"$base/hll_ckpt",
        "event_type", "user", compactEvery = compactEvery)
    }

    def fmt(c: Array[(Long, Double)]) = c
      .map { case (r, s) => s"""{"rows":$r,"sec":${f"$s%.2f"}}""" }
      .mkString("[", ",", "]")
    def rate(c: Array[(Long, Double)]) = {
      val half = c.drop(c.length / 2)
      if (half.nonEmpty && half.map(_._2).sum > 0)
        (half.map(_._1).sum / half.map(_._2).sum).round
      else 0L
    }
    println(s"""VIEWBENCH {"rows":$nRows,"compact_every":$compactEvery""" +
      s""","hist":{"batches":${histCurve.length},"steady_rows_per_sec":${rate(histCurve)},"wall_sec":${f"$histWall%.1f"},"curve":${fmt(histCurve)}}""" +
      s""","hll":{"batches":${hllCurve.length},"steady_rows_per_sec":${rate(hllCurve)},"wall_sec":${f"$hllWall%.1f"},"curve":${fmt(hllCurve)}}}""")
    spark.stop()
  }
}
