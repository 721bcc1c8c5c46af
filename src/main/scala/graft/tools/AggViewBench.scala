package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Cdc
import graft.sources.Tables
import graft.streaming.AggViewStream

/** Measures the incremental-view-maintenance claim: folding a CDC delta
  * into the persisted view ([[AggViewStream.applyBatch]]) must cost
  * delta-sized work, FLAT as history grows, while the recompute
  * alternative (re-aggregate the full changelog prefix every refresh)
  * grows linearly with history — the gap that makes maintenance the only
  * viable refresh strategy at 100 TB.
  *
  * Shape: the `events` fixture becomes a `{before, after}` changelog
  * ([[Cdc.envelopeWithBefore]]) written to parquet as one file per chunk
  * BEFORE timing — the changelog lives AT REST, exactly like a Debezium
  * topic's archive, so both lanes pay real scan cost. Per chunk, in
  * order:
  *   - `fold`: [[AggViewStream.applyBatch]] — reads the ONE new chunk
  *     file plus the few-row view, merges, swaps the store;
  *   - `recompute`: [[Cdc.aggView]] over chunk files `0..c` — the
  *     refresh strategy that re-reads the whole history every time.
  * Both lanes land on the identical view (asserted at the end). The
  * honest expectation at local[32] with a fixture-sized history:
  * per-chunk wall-clock is fixed-overhead-bound for both lanes, and the
  * measurement to read is BYTES SCANNED per refresh — fold flat at
  * |delta|, recompute growing linearly to |history| — because at 100 TB
  * the scan term is the whole cost.
  *
  * Usage: `runMain graft.tools.AggViewBench [sfDir=/root/testdata/sf0.1]
  * [chunks=10]` → per-chunk timing lines + one `AGGVIEWBENCH {...}` JSON
  * line with wall-clock AND scanned-bytes curves for both lanes.
  */
object AggViewBench {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val chunks = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-aggview-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files
      .createTempDirectory("graft-aggview-bench").toString
    val viewDir = s"$base/view"
    // lay the changelog down at rest, one dir per chunk (untimed)
    val env = Cdc.envelopeWithBefore(Tables.events(spark, sfDir))
      .localCheckpoint()
    val nRows = env.count()
    val maxOff = env.agg(max(col("offset"))).head().getLong(0)
    val cut = (maxOff + chunks - 1) / chunks
    val chunkDirs = (0 until chunks).map { c =>
      val lo = c.toLong * cut
      val hi = (c + 1).toLong * cut + (if (c == chunks - 1) 1 else 0)
      val dir = s"$base/chunks/c$c"
      env.filter(col("offset") >= lo && col("offset") < hi)
        .coalesce(1).write.parquet(dir)
      dir
    }
    def dirBytes(dirs: Seq[String]): Long = dirs.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    }.sum

    val foldTimes = new Array[Double](chunks)
    val recomputeTimes = new Array[Double](chunks)
    val foldBytes = new Array[Long](chunks)
    val recomputeBytes = new Array[Long](chunks)
    (0 until chunks).foreach { c =>
      foldTimes(c) = timed {
        AggViewStream.applyBatch(
          spark.read.parquet(chunkDirs(c)), viewDir, "bench", c.toLong)
      }
      foldBytes(c) = dirBytes(Seq(chunkDirs(c)))
      // the alternative refresh: re-aggregate the whole at-rest prefix
      recomputeTimes(c) = timed {
        Cdc.aggView(spark.read.parquet(chunkDirs.take(c + 1): _*))
          .write.format("noop").mode("overwrite").save()
      }
      recomputeBytes(c) = dirBytes(chunkDirs.take(c + 1))
      println(f"[aggviewbench] chunk $c%2d" +
        f"  fold ${foldTimes(c)}%6.3f s / ${foldBytes(c) / 1024}%7d KB" +
        f"  recompute ${recomputeTimes(c)}%6.3f s / ${recomputeBytes(c) / 1024}%7d KB")
    }

    // both lanes must land on the same view
    val folded = AggViewStream.view(spark, viewDir)
      .select("event_type", "cnt", "sum_value")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros)).sortBy(_._1).toSeq
    val recomputed = Cdc.aggView(env)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros)).sortBy(_._1).toSeq
    require(folded == recomputed,
      "fold and recompute diverged — bench invalid")

    def stats(a: Array[Double]) =
      (a.sum, a.take(3).sum / 3, a.takeRight(3).sum / 3)
    val (fSum, fHead, fTail) = stats(foldTimes)
    val (rSum, rHead, rTail) = stats(recomputeTimes)
    println(f"""AGGVIEWBENCH {"chunks":$chunks,"rows":$nRows,""" +
      f""""fold_total":$fSum%.3f,"fold_first3":$fHead%.3f,""" +
      f""""fold_last3":$fTail%.3f,"recompute_total":$rSum%.3f,""" +
      f""""recompute_first3":$rHead%.3f,"recompute_last3":$rTail%.3f,""" +
      f""""fold_last_kb":${foldBytes.last / 1024},""" +
      f""""recompute_last_kb":${recomputeBytes.last / 1024}}""")
    spark.stop()
  }
}
