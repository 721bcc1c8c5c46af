package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

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
  * per-batch `(grp, bin, cnt)` partial aggregates — no read-modify-write,
  * no before images, order-free — and any reader sums bins at query time
  * ([[quantiles]] reuses the batch walk verbatim). The append rides the
  * shared exactly-once additive protocol ([[Streams.foldAppendOnce]]):
  * each batch commits ATOMICALLY as its own `batch=<lineage>-<id>`
  * partition (a partial write is invisible; a replayed batch finds its
  * commit record and skips; a store adopted under a fresh checkpoint
  * appends under the new lineage instead of colliding with old ids),
  * and periodic compaction re-sums the log to one partition — bounded at
  * ≤ n_groups × bins rows, reader-invisible by associativity, crash-safe
  * swap.
  *
  * The ONE streaming-specific constraint: the grid must be pinned BEFORE
  * data is seen (`mn`/`mx`/`bins` parameters — in production, domain
  * knowledge: latency in [0, 60s], score in [0, 1]); out-of-domain
  * values clamp into edge cells, preserving their rank contribution.
  * The geometry IS the store's format marker: a restart with a different
  * grid fails fast, and the READ path parses its grid from the marker
  * rather than trusting the caller — a dashboard cannot silently read a
  * [0, 60] store through a [0, 30] lens. */
object HistogramStream {

  private def formatTag(mn: Double, mx: Double, bins: Int): String =
    s"grid-histogram/min=$mn/max=$mx/bins=$bins"

  private val TagRe = """grid-histogram/min=(.+)/max=(.+)/bins=(\d+)""".r

  private val storeSchema = StructType(Seq(
    StructField("grp", StringType),
    StructField("bin", IntegerType),
    StructField("cnt", LongType)))

  /** Fold one microbatch into the store. Public so the replay contract
    * is testable without a running stream; [[start]] wires it into
    * `foreachBatch` with the checkpoint's lineage id. */
  def applyBatch(batch: DataFrame, stateDir: String, lineage: String,
                 batchId: Long, groupCol: String, valueCol: String,
                 mn: Double, mx: Double, bins: Int,
                 compactEvery: Int): Unit =
    Streams.foldAppendOnce(batch.sparkSession, stateDir, lineage, batchId,
      formatTag(mn, mx, bins), "HistogramStream", compactEvery) {
      QuantileView.sketchByFixed(batch, groupCol, valueCol, mn, mx, bins)
        .select(col("grp"), col("bin"), col("cnt"))
    } { log =>
      log.groupBy(col("grp"), col("bin")).agg(sum(col("cnt")).as("cnt"))
    }

  /** Start the fold: maintains the store at `stateDir`. `rows` must be a
    * streaming DataFrame holding `groupCol` and a numeric `valueCol`. */
  def start(rows: DataFrame, stateDir: String, checkpoint: String,
            groupCol: String, valueCol: String,
            mn: Double, mx: Double, bins: Int = 4096,
            compactEvery: Int = 0): StreamingQuery = {
    require(compactEvery >= 0, "compactEvery must be >= 0")
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val lineage = Streams.lineageId(
          batch.sparkSession.sparkContext.hadoopConfiguration, checkpoint)
        applyBatch(batch, stateDir, lineage, batchId, groupCol, valueCol,
          mn, mx, bins, compactEvery)
      }
      .start()
  }

  /** The store's grid, read from its own format marker. */
  def geometry(spark: SparkSession, stateDir: String): (Double, Double, Int) = {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Streams.readStoreFormat(fs, stateDir) match {
      case Some(TagRe(mn, mx, bins)) => (mn.toDouble, mx.toDouble, bins.toInt)
      // no marker AND no store: nothing has committed yet — the typed
      // not-ready signal a view registry may absorb; a store that EXISTS
      // without a parseable marker is malformed and must surface
      case None if !fs.exists(new org.apache.hadoop.fs.Path(stateDir)) =>
        throw new Streams.StoreNotReadyException(
          s"$stateDir has no HistogramStream store yet")
      case other => throw new IllegalStateException(
        s"$stateDir carries no HistogramStream geometry marker (found: $other)")
    }
  }

  /** The maintained view in [[QuantileView]]'s shape (bin-wise sums over
    * the log plus the grid geometry FROM THE STORE's marker) — feed it to
    * [[QuantileView.quantilesByGroup]] / [[QuantileView.rollupQuantiles]]
    * for the same walk the batch path uses. Empty frame on a store no
    * batch has committed to yet. */
  def view(spark: SparkSession, stateDir: String): DataFrame = {
    val (mn, mx, bins) = geometry(spark, stateDir)
    Streams.readFoldStore(spark, stateDir, storeSchema)
      .groupBy(col("grp"), col("bin")).agg(sum(col("cnt")).as("cnt"))
      .withColumn("v_min", lit(mn))
      .withColumn("v_max", lit(mx))
      .withColumn("bins", lit(bins))
  }

  /** Per-group quantiles straight off the store. */
  def quantiles(spark: SparkSession, stateDir: String,
                qs: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame =
    QuantileView.quantilesByGroup(view(spark, stateDir), qs)
}
