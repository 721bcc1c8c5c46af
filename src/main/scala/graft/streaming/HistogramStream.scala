package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.QuantileView

/** Streaming quantile-view maintenance — the at-ingest twin of
  * [[QuantileView.sketchBy]], and the percentile face of the same
  * "maintained tiny view" family as [[AggViewStream]] (count/sum) and
  * [[HeavyHittersStream]] (top-k): a latency/value dashboard's
  * p50/p95/p99-per-group, served from a store that each microbatch grows
  * by at most its own `(group, bin)` occupancy.
  *
  * The grid histogram is what makes this trivially correct under
  * streaming: counts are PURE SUMS, so the fold is an append of
  * per-batch `(grp, bin, cnt)` rows — no read-modify-write, no before
  * images, order-free — and any reader sums bins at query time
  * ([[quantiles]] reuses the batch walk verbatim). Periodic compaction
  * ([[Streams.rewriteStore]]) re-sums the log so the store stays bounded
  * at ≤ n_groups × bins rows regardless of batch count; readers see
  * identical sums before and after (associativity), and the swap is the
  * shared crash-safe two-rename.
  *
  * The ONE streaming-specific constraint: the grid must be pinned BEFORE
  * data is seen (`mn`/`mx`/`bins` parameters — in production, domain
  * knowledge: latency in [0, 60s], score in [0, 1]); out-of-domain
  * values clamp into edge cells, preserving their rank contribution.
  * The geometry rides the shared format marker
  * ([[Streams.checkStoreFormat]]), so a restart with a different grid
  * fails fast instead of silently merging incompatible cells.
  *
  * Replay safety: a batch that crashed after its append replays and
  * appends its rows AGAIN — additive stores need the batch-id guard the
  * rows carry: the append is skipped when the store already holds this
  * `__batch_id` (one bounded max-scan of the tiny store per batch). */
object HistogramStream {

  private def formatTag(mn: Double, mx: Double, bins: Int): String =
    s"grid-histogram/min=$mn/max=$mx/bins=$bins"

  /** Fold one microbatch into the store. Public so the replay contract
    * is testable without a running stream; [[start]] wires it into
    * `foreachBatch`. */
  def applyBatch(batch: DataFrame, stateDir: String, batchId: Long,
                 groupCol: String, valueCol: String,
                 mn: Double, mx: Double, bins: Int,
                 compactEvery: Int): Unit = {
    val spark = batch.sparkSession
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Streams.recoverCompaction(fs, stateDir)
    Streams.checkStoreFormat(fs, stateDir, formatTag(mn, mx, bins),
      "HistogramStream")
    // additive store + at-least-once delivery → replay guard: skip the
    // append when this batch's rows are already in the store (one
    // bounded max-scan of the tiny store)
    val alreadyApplied = fs.exists(statePath) && {
      val last = spark.read.parquet(stateDir)
        .agg(max(col("__batch_id"))).head()
      !last.isNullAt(0) && last.getLong(0) >= batchId
    }
    if (!alreadyApplied) {
      Streams.appendPartitioned(
        QuantileView.sketchByFixed(batch, groupCol, valueCol, mn, mx, bins)
          .select(col("grp"), col("bin"), col("cnt"))
          .withColumn("__batch_id", lit(batchId)),
        stateDir, "grp")
      if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
        // re-sum the log: bounded at n_groups × bins rows, readers see
        // identical sums (counter associativity); keep the MAX batch id
        // so the replay guard survives compaction
        Streams.rewriteStore(spark, stateDir, Seq("grp"))(
          _.groupBy(col("grp"), col("bin"))
            .agg(sum(col("cnt")).as("cnt"),
              max(col("__batch_id")).as("__batch_id")))
    }
  }

  /** Start the fold: maintains the `(grp, bin, cnt, __batch_id)` store
    * at `stateDir`. `rows` must be a streaming DataFrame holding
    * `groupCol` and a numeric `valueCol`. */
  def start(rows: DataFrame, stateDir: String, checkpoint: String,
            groupCol: String, valueCol: String,
            mn: Double, mx: Double, bins: Int = 4096,
            compactEvery: Int = 0): StreamingQuery = {
    require(compactEvery >= 0, "compactEvery must be >= 0")
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, stateDir, batchId, groupCol, valueCol,
          mn, mx, bins, compactEvery)
      }
      .start()
  }

  /** The maintained view in [[QuantileView]]'s shape (bin-wise sums over
    * the log plus the grid geometry) — feed it to
    * [[QuantileView.quantilesByGroup]] / [[QuantileView.rollupQuantiles]]
    * for the same walk the batch path uses. */
  def view(spark: SparkSession, stateDir: String,
           mn: Double, mx: Double, bins: Int = 4096): DataFrame =
    spark.read.parquet(stateDir)
      .groupBy(col("grp"), col("bin")).agg(sum(col("cnt")).as("cnt"))
      .withColumn("v_min", lit(mn))
      .withColumn("v_max", lit(mx))
      .withColumn("bins", lit(bins))

  /** Per-group quantiles straight off the store. */
  def quantiles(spark: SparkSession, stateDir: String,
                mn: Double, mx: Double, bins: Int = 4096,
                qs: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame =
    QuantileView.quantilesByGroup(view(spark, stateDir, mn, mx, bins), qs)
}
