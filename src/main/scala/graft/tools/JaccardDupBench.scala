package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.JaccardDupStream

/** Scale certification for the STREAMING Jaccard-estimate dedup — the
  * sixth modality, benched under the same sibling protocol
  * ([[MinHashDupBench]] etc.): per-batch latency curve, throughput,
  * store size; with full history (`retain = 0`) and `check = 1` the
  * emitted scored-pair set's SIZE is cross-checked against the batch
  * operator [[graft.operators.Dedup.minhashJaccardEstimate]] over the
  * same corpus (the StreamingSpec proves value-level equality; at
  * replica scale the count is the tractable check).
  *
  * Usage: `runMain graft.tools.JaccardDupBench <docsDir>
  * [retainBatches=0] [pruneEvery=0] [maxFilesPerTrigger=5] [check=0]
  * [minEst=0.0]`. Prints one `JACCARDDUPBENCH {...}` JSON line. */
object JaccardDupBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: JaccardDupBench <docsDir> [retainBatches] [pruneEvery] " +
        "[maxFilesPerTrigger] [check] [minEst]")
    val docsDir = args(0)
    val retain = if (args.length > 1) args(1).toInt else 0
    val pruneEvery = if (args.length > 2) args(2).toInt else 0
    val filesPerTrigger = if (args.length > 3) args(3).toInt else 5
    val check = args.length > 4 && args(4).toInt == 1
    val minEst = if (args.length > 5) args(5).toDouble else 0.0
    require(!check || (retain == 0 && minEst == 0.0),
      "the batch-operator cross-check needs full history and no threshold")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jaccarddupbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // progress ledger IS the measurement (default cap 100 entries)
      .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val static = spark.read.parquet(docsDir).select("doc_id", "text")
    val nDocs = static.count()
    val docs = spark.readStream.schema(static.schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(docsDir).select("doc_id", "text")

    val base = java.nio.file.Files
      .createTempDirectory("graft-jdbench").toString
    val t0 = System.nanoTime()
    val q = JaccardDupStream.start(docs, s"$base/state", s"$base/matches",
      s"$base/checkpoint", minEst = minEst,
      retainBatches = retain, pruneEvery = pruneEvery)
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
    val nMatches = JaccardDupStream.matches(spark, s"$base/matches").count()
    val batchMatches =
      if (check)
        graft.operators.Dedup.minhashJaccardEstimate(static).count()
      else -1L
    val curve = batches
      .map { case (r, s) => s"""{"rows":$r,"sec":${f"$s%.2f"}}""" }
      .mkString("[", ",", "]")
    println(s"""JACCARDDUPBENCH {"docs":$nDocs,"batches":${batches.length},"retain_batches":$retain,"min_est":$minEst,"docs_per_sec":${if (execSec > 0) (rows / execSec).round else 0},"steady_docs_per_sec":$steadyRate,"exec_sec":${f"$execSec%.1f"},"wall_sec":${f"$wallSec%.1f"},"store_mb":${f"${storeBytes / 1e6}%.1f"},"matches":$nMatches,"batch_op_matches":$batchMatches,"curve":$curve,"cpus":$cpus}""")
    spark.stop()
  }
}
