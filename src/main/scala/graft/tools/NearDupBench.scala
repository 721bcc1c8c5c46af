package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.NearDupStream

/** Scale certification for the STREAMING near-dup detector — the one
  * stateful streaming component whose cost model ([[NearDupStream]]'s
  * partition-pruned cross-batch store reads) had only batch-side scale
  * evidence. Drives `NearDupStream.start(wide = true)` over a documents
  * corpus split into many microbatches (a file stream with
  * `maxFilesPerTrigger`, so batch boundaries are deterministic and the
  * rows are read in executors, never shipped through the driver), and
  * reports the per-batch latency CURVE alongside throughput — the curve
  * is the deliverable: if the pruned cross-batch read scaled with total
  * store size instead of the batch's own slices, later batches would be
  * strictly slower and the curve would climb; with retention
  * (`retainBatches`) the store is horizon-bounded and the curve must
  * flatten at the horizon.
  *
  * Usage: `runMain graft.tools.NearDupBench <docsDir>
  * [retainBatches=0] [pruneEvery=0] [maxFilesPerTrigger=5]`
  * where docsDir is a documents parquet dir (e.g. a
  * [[ScaleUp]] `documents`-only replica). Prints one `NEARDUPBENCH {...}`
  * JSON line with per-batch (rows, seconds) pairs, docs/s over the
  * steady half, store size, and match count. */
object NearDupBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: NearDupBench <docsDir> [retainBatches] [pruneEvery] [maxFilesPerTrigger]")
    val docsDir = args(0)
    val retain = if (args.length > 1) args(1).toInt else 0
    val pruneEvery = if (args.length > 2) args(2).toInt else 0
    val filesPerTrigger = if (args.length > 3) args(3).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-neardupbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the progress ledger IS the measurement: default cap is 100 entries,
      // a >100-batch run would silently drop its earliest batches from the
      // reported curve and totals (round-12 self-review)
      .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val static = spark.read.parquet(docsDir).select("doc_id", "text")
    val nDocs = static.count()
    val docs = spark.readStream.schema(static.schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(docsDir).select("doc_id", "text")

    val base = java.nio.file.Files.createTempDirectory("graft-ndbench").toString
    val t0 = System.nanoTime()
    val q = NearDupStream.start(docs, s"$base/state", s"$base/matches",
      s"$base/checkpoint", wide = true,
      retainBatches = retain, pruneEvery = pruneEvery)
    try {
      q.processAllAvailable() // file stream: drains every available file
      q.exception.foreach(throw _)
    } finally q.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9

    val batches = q.recentProgress.filter(_.numInputRows > 0)
      .map(p => (p.numInputRows,
        p.durationMs.get("triggerExecution").toLong / 1000.0))
    val rows = batches.map(_._1).sum
    val execSec = batches.map(_._2).sum
    // steady-state rate: second half of the run, where the store holds
    // most of its history — the number that would degrade if the
    // cross-batch read cost grew with the full store
    val half = batches.drop(batches.length / 2)
    val steadyRate =
      if (half.nonEmpty && half.map(_._2).sum > 0)
        (half.map(_._1).sum / half.map(_._2).sum).round
      else 0L
    def dirBytes(p: java.nio.file.Path): Long =
      if (!java.nio.file.Files.exists(p)) 0L
      else {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
    val storeBytes = dirBytes(java.nio.file.Paths.get(s"$base/state"))
    val nMatches = NearDupStream.matches(spark, s"$base/matches").count()
    val curve = batches
      .map { case (r, s) => s"""{"rows":$r,"sec":${f"$s%.2f"}}""" }
      .mkString("[", ",", "]")
    println(s"""NEARDUPBENCH {"wide":true,"docs":$nDocs,"batches":${batches.length},"retain_batches":$retain,"docs_per_sec":${if (execSec > 0) (rows / execSec).round else 0},"steady_docs_per_sec":$steadyRate,"exec_sec":${f"$execSec%.1f"},"wall_sec":${f"$wallSec%.1f"},"store_mb":${f"${storeBytes / 1e6}%.1f"},"matches":$nMatches,"curve":$curve,"cpus":$cpus}""")
    spark.stop()
  }
}
