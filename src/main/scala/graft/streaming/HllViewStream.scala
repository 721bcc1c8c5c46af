package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming distinct-count view maintenance — the at-ingest twin of
  * [[graft.functions.HllView]] and the fourth member of the
  * maintained-tiny-view family ([[AggViewStream]] count/sum,
  * [[HistogramStream]] percentiles, [[HeavyHittersStream]] top-k):
  * "distinct tokens per source, so far" served from a store each
  * microbatch grows by one ~KB sketch row per touched group.
  *
  * HLL registers merge by element-wise max — associative and
  * commutative — so the fold is an order-free APPEND of per-batch
  * `(grp, sketch)` rows; readers `hll_union_agg` at query time, and the
  * result is BIT-IDENTICAL to a single sketch of the whole stream no
  * matter how the batches fell (the spec asserts exact equality, not a
  * bound). Periodic compaction unions the log down to one row per group
  * (reader-invisible by the same associativity, crash-safe two-rename
  * swap). `lgK` rides the shared format marker — sketches of different
  * register counts must not union.
  *
  * Replay safety: additive store + at-least-once delivery → the same
  * batch-id guard as [[HistogramStream]] (union is idempotent only for
  * IDENTICAL sketches; a replayed batch's sketch is identical, but
  * skipping beats relying on that, and keeps the store's row count
  * honest). */
object HllViewStream {

  private def formatTag(lgK: Int): String = s"hll-datasketches/lgK=$lgK"

  /** Fold one microbatch of `(groupCol, tokenCol)` rows into the store. */
  def applyBatch(batch: DataFrame, stateDir: String, batchId: Long,
                 groupCol: String, tokenCol: String, lgK: Int,
                 compactEvery: Int): Unit = {
    val spark = batch.sparkSession
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Streams.recoverCompaction(fs, stateDir)
    Streams.checkStoreFormat(fs, stateDir, formatTag(lgK), "HllViewStream")
    val alreadyApplied = fs.exists(statePath) && {
      val last = spark.read.parquet(stateDir)
        .agg(max(col("__batch_id"))).head()
      !last.isNullAt(0) && last.getLong(0) >= batchId
    }
    if (!alreadyApplied) {
      Streams.appendPartitioned(
        batch.select(col(groupCol).as("grp"), col(tokenCol).as("tok"))
          .groupBy(col("grp"))
          .agg(hll_sketch_agg(col("tok"), lit(lgK)).as("sketch"))
          .withColumn("__batch_id", lit(batchId)),
        stateDir, "grp")
      if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
        Streams.rewriteStore(spark, stateDir, Seq("grp"))(
          _.groupBy(col("grp"))
            .agg(hll_union_agg(col("sketch")).as("sketch"),
              max(col("__batch_id")).as("__batch_id")))
    }
  }

  /** Start the fold: maintains the `(grp, sketch, __batch_id)` store.
    * `rows` must be a streaming DataFrame holding `groupCol` and
    * `tokenCol`. */
  def start(rows: DataFrame, stateDir: String, checkpoint: String,
            groupCol: String, tokenCol: String, lgK: Int = 12,
            compactEvery: Int = 0): StreamingQuery = {
    require(compactEvery >= 0, "compactEvery must be >= 0")
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, stateDir, batchId, groupCol, tokenCol, lgK,
          compactEvery)
      }
      .start()
  }

  /** The maintained view in [[graft.functions.HllView]]'s shape: one
    * unioned sketch per group — feed it to `distinctBySource` /
    * `rollupDistinct` for the same readouts the batch path uses. */
  def view(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(stateDir)
      .groupBy(col("grp").as("source"))
      .agg(hll_union_agg(col("sketch")).as("sketch"))
}
