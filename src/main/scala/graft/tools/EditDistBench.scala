package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.EditDistStream

/** Scale certification for the STREAMING edit-distance dedup — same
  * protocol as [[EmbedDupBench]]/[[NearDupBench]]: drive
  * [[EditDistStream]] over a documents corpus split into deterministic
  * microbatches (file stream, rows read in executors) and report the
  * per-batch latency curve, throughput, and store size. The cross-batch
  * probe is segment-part-pruned and candidates are verbatim ~13-char
  * segment matches, so per-batch cost must track the batch's own near-dup
  * incidence, not total store size — a FLAT latency curve as the store
  * grows is the pass criterion.
  *
  * Usage: `runMain graft.tools.EditDistBench <docsDir>
  * [retainBatches=0] [pruneEvery=0] [maxFilesPerTrigger=1]`.
  * Prints one `EDITDISTBENCH {...}` JSON line. */
object EditDistBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: EditDistBench <docsDir> [retainBatches] [pruneEvery] [maxFilesPerTrigger]")
    val docsDir = args(0)
    val retain = if (args.length > 1) args(1).toInt else 0
    val pruneEvery = if (args.length > 2) args(2).toInt else 0
    val filesPerTrigger = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-editdistbench")
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

    val base = java.nio.file.Files.createTempDirectory("graft-edbench").toString
    val t0 = System.nanoTime()
    val q = EditDistStream.start(docs, s"$base/state", s"$base/matches",
      s"$base/checkpoint", retainBatches = retain, pruneEvery = pruneEvery)
    try {
      q.processAllAvailable()
      q.exception.foreach(throw _)
    } finally q.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9

    val batches = q.recentProgress.filter(_.numInputRows > 0)
      .map(p => (p.numInputRows,
        p.durationMs.get("triggerExecution").toLong / 1000.0))
    val rows = batches.map(_._1).sum
    val execSec = batches.map(_._2).sum
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
    val nMatches = EditDistStream.matches(spark, s"$base/matches").count()
    val curve = batches
      .map { case (r, s) => s"""{"rows":$r,"sec":${f"$s%.2f"}}""" }
      .mkString("[", ",", "]")
    println(s"""EDITDISTBENCH {"docs":$nDocs,"batches":${batches.length},"retain_batches":$retain,"docs_per_sec":${if (execSec > 0) (rows / execSec).round else 0},"steady_docs_per_sec":$steadyRate,"exec_sec":${f"$execSec%.1f"},"wall_sec":${f"$wallSec%.1f"},"store_mb":${f"${storeBytes / 1e6}%.1f"},"matches":$nMatches,"curve":$curve,"cpus":$cpus}""")
    spark.stop()
  }
}
