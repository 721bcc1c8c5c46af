package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.MinHashDupStream

/** Scale certification for the STREAMING MinHash-LSH dedup — same
  * protocol as its four siblings ([[NearDupBench]]/[[SubstrBench]]/
  * [[EmbedDupBench]]/[[EditDistBench]]): drive [[MinHashDupStream]] over
  * a documents corpus split into deterministic microbatches (file
  * stream, rows read in executors) and report the per-batch latency
  * curve, throughput, and store size. The cross-batch probe is
  * band-part-pruned and candidates only form on true band agreement, so
  * per-batch cost must track the batch's own near-dup incidence plus the
  * pruned store slices — a FLAT curve under retention (store bounded to
  * the horizon) is the pass criterion.
  *
  * With `retainBatches = 0` (full history) and `check = 1` the run also
  * cross-checks the emitted candidate set against the batch operator
  * ([[graft.operators.Dedup.minhashCandidatePairs]]) over the same
  * corpus — the streamed union must equal the nightly batch answer
  * exactly (the StreamingSpec equality, re-proven at replica scale).
  *
  * Usage: `runMain graft.tools.MinHashDupBench <docsDir>
  * [retainBatches=0] [pruneEvery=0] [maxFilesPerTrigger=5] [check=0]`.
  * Prints one `MINHASHDUPBENCH {...}` JSON line. */
object MinHashDupBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: MinHashDupBench <docsDir> [retainBatches] [pruneEvery] " +
        "[maxFilesPerTrigger] [check]")
    val docsDir = args(0)
    val retain = if (args.length > 1) args(1).toInt else 0
    val pruneEvery = if (args.length > 2) args(2).toInt else 0
    val filesPerTrigger = if (args.length > 3) args(3).toInt else 5
    val check = args.length > 4 && args(4).toInt == 1
    require(!check || retain == 0,
      "the batch-operator cross-check needs the full history (retain=0)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-minhashdupbench")
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

    val base = java.nio.file.Files
      .createTempDirectory("graft-mhbench").toString
    val t0 = System.nanoTime()
    val q = MinHashDupStream.start(docs, s"$base/state", s"$base/matches",
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
    val nMatches = MinHashDupStream.matches(spark, s"$base/matches").count()
    // the at-scale equality: streamed union ≡ the batch operator's answer
    val batchMatches =
      if (check) graft.operators.Dedup.minhashCandidatePairs(static).count()
      else -1L
    val curve = batches
      .map { case (r, s) => s"""{"rows":$r,"sec":${f"$s%.2f"}}""" }
      .mkString("[", ",", "]")
    println(s"""MINHASHDUPBENCH {"docs":$nDocs,"batches":${batches.length},"retain_batches":$retain,"docs_per_sec":${if (execSec > 0) (rows / execSec).round else 0},"steady_docs_per_sec":$steadyRate,"exec_sec":${f"$execSec%.1f"},"wall_sec":${f"$wallSec%.1f"},"store_mb":${f"${storeBytes / 1e6}%.1f"},"matches":$nMatches,"batch_op_matches":$batchMatches,"curve":$curve,"cpus":$cpus}""")
    spark.stop()
  }
}
