package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming distinct-count view maintenance — the at-ingest twin of
  * [[graft.functions.HllView]] and the fourth member of the
  * maintained-tiny-view family ([[AggViewStream]] count/sum,
  * [[HistogramStream]] percentiles, [[HeavyHittersStream]] top-k):
  * "distinct tokens per source, so far" served from a store each
  * microbatch grows by one ~KB sketch row per touched group.
  *
  * HLL registers merge by element-wise max — associative and
  * commutative — so the fold is an order-free append of per-batch
  * `(grp, sketch)` rows; readers `hll_union_agg` at query time, and the
  * result is BIT-IDENTICAL to a single sketch of the whole stream no
  * matter how the batches fell (the spec asserts exact equality, not a
  * bound). The append rides the shared exactly-once additive protocol
  * ([[Streams.foldAppendOnce]]: atomic per-batch partition commit,
  * lineage-scoped replay guard, crash-safe compaction down to one row
  * per group). `lgK` rides the format marker — sketches of different
  * register counts must not union. */
object HllViewStream {

  private def formatTag(lgK: Int): String = s"hll-datasketches/lgK=$lgK"

  private val storeSchema = StructType(Seq(
    StructField("grp", StringType),
    StructField("sketch", BinaryType)))

  /** Fold one microbatch of `(groupCol, tokenCol)` rows into the store. */
  def applyBatch(batch: DataFrame, stateDir: String, lineage: String,
                 batchId: Long, groupCol: String, tokenCol: String,
                 lgK: Int, compactEvery: Int): Unit =
    Streams.foldAppendOnce(batch.sparkSession, stateDir, lineage, batchId,
      formatTag(lgK), "HllViewStream", compactEvery) {
      batch.select(col(groupCol).as("grp"), col(tokenCol).as("tok"))
        .groupBy(col("grp"))
        .agg(hll_sketch_agg(col("tok"), lit(lgK)).as("sketch"))
    } { log =>
      log.groupBy(col("grp"))
        .agg(hll_union_agg(col("sketch")).as("sketch"))
    }

  /** Start the fold. `rows` must be a streaming DataFrame holding
    * `groupCol` and `tokenCol`. */
  def start(rows: DataFrame, stateDir: String, checkpoint: String,
            groupCol: String, tokenCol: String, lgK: Int = 12,
            compactEvery: Int = 0): StreamingQuery = {
    require(compactEvery >= 0, "compactEvery must be >= 0")
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val lineage = Streams.lineageId(
          batch.sparkSession.sparkContext.hadoopConfiguration, checkpoint)
        applyBatch(batch, stateDir, lineage, batchId, groupCol, tokenCol,
          lgK, compactEvery)
      }
      .start()
  }

  /** The maintained view in [[graft.functions.HllView]]'s shape: one
    * unioned sketch per group — feed it to `distinctBySource` /
    * `rollupDistinct` for the same readouts the batch path uses. Empty
    * frame on a store no batch has committed to yet. */
  def view(spark: SparkSession, stateDir: String): DataFrame =
    Streams.readFoldStore(spark, stateDir, storeSchema)
      .groupBy(col("grp").as("source"))
      .agg(hll_union_agg(col("sketch")).as("sketch"))
}
