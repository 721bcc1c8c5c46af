package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.SketchExpressions
import graft.operators.Relational

/** PER-PARTITION Bloom sidecars for a partitioned side store — the scale
  * fix for the one store that can never retention-prune:
  * [[IngestGuard]]'s corpus-lifetime fingerprint store (round-12
  * verdict). A single driver-held filter sized up front has two 100 TB
  * failure modes: at ~1e11 members a 1%-fpp filter is ~120 GB
  * (infeasible to hold or ship), and a filter that silently SATURATES
  * degrades to all-positive — every batch then pays the full pruned
  * read, with no error anywhere. Sharding by the store's own partition
  * key fixes both structurally:
  *
  *  - each shard is sized to ITS slice (store rows / parts), so memory
  *    per loaded shard is corpus/parts, and only the batch's own touched
  *    partitions are ever loaded;
  *  - saturation is detected per shard from its tracked `n_items` and
  *    repaired by rebuilding THAT shard from ITS store partition — a
  *    one-partition read, never a corpus scan. Capacity grows
  *    geometrically (double on saturation), so total rebuild work is
  *    amortized O(corpus) per doubling, the dynamic-array argument;
  *  - a live store partition with no usable shard (adoption, torn
  *    write, lineage change) is indistinguishable from stale and is
  *    rebuilt the same way — self-healing, like the global sidecar it
  *    replaces.
  *
  * Layout: `<stateDir>.__bloomparts/` is an APPEND-LOG, not a
  * dir-per-shard table — one parquet file per batch holding the touched
  * shards' current rows `(fp_part, capacity, n_items, bloom, __lineage,
  * __batch_id)`, sorted by `fp_part` so loads prune row groups by the
  * touched-part predicate; the latest own-lineage row per part wins.
  * (The first cut partitioned the sidecar by `fp_part`: 256 partition
  * dirs meant 256 parquet-writer inits per batch through one task —
  * profiled at ~5 s/batch of pure file-create overhead. The log writes
  * ONE file per batch and compacts every [[IngestGuard]] cadence to
  * latest-per-part through the crash-safe [[Streams.rewriteStore]]
  * swap.)
  *
  * Lineage scoping: batch ids are checkpoint-scoped, so ordering rows
  * from DIFFERENT lineages by batch id would let a stale shard shadow a
  * newer one after a fresh-checkpoint adoption — and a stale Bloom has
  * FALSE NEGATIVES, the one failure correctness can't absorb. The
  * loader therefore trusts only the CURRENT lineage's rows; a live
  * partition with none is rebuilt from the store on first touch (a
  * one-time warming cost per adoption), and compaction drops foreign
  * rows (they can never serve a read again). `n_items` is an UPPER
  * estimate (a replayed batch re-merges its items), so over-counting
  * only triggers an EARLY rebuild — which resets it from the store's
  * actual row count.
  *
  * Single-writer per store, like every side store here (call from the
  * owning foreachBatch only). */
object BloomShards {

  /** One shard: geometry + the live filter. */
  final case class Shard(capacity: Long, nItems: Long, bloom: BloomFilter)

  def sidecarDir(stateDir: String): String = stateDir + ".__bloomparts"

  private def deser(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  private def ser(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  /** Current shards for `parts` under `lineage`: latest own-lineage row
    * per part (one small shuffle over the pruned log — the touched-part
    * predicate reaches the scan, and log files are fp_part-sorted, so
    * row-group stats prune inside each file). Empty map when the
    * sidecar doesn't exist yet; parts absent from the result are either
    * fresh or need a rebuild — the caller's staleness check decides. */
  def load(spark: SparkSession, stateDir: String, partCol: String,
           lineage: String, parts: Seq[Int]): Map[Int, Shard] = {
    val d = new org.apache.hadoop.fs.Path(sidecarDir(stateDir))
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Streams.recoverCompaction(fs, sidecarDir(stateDir))
    if (parts.isEmpty || !fs.exists(d)) Map.empty
    else Relational.latestByKeys(
        spark.read.parquet(sidecarDir(stateDir))
          .filter(col(partCol).isin(parts: _*))
          .filter(col("__lineage") <=> lit(lineage)),
        Seq(partCol), col("__batch_id"))
      .select(col(partCol).cast("int"), col("capacity"), col("n_items"),
        col("bloom"))
      .collect()
      .map(r => r.getInt(0) ->
        Shard(r.getLong(1), r.getLong(2), deser(r.getAs[Array[Byte]](3))))
      .toMap
  }

  /** Rebuild the shards for `parts` from the store itself — a
    * partition-pruned read grouped on the partition key, ONE job for
    * every stale shard of the batch (a capacity migration touches many
    * parts at once; per-part jobs would serialize into a spike).
    * `n_items` restarts from the partition's actual row count. */
  def rebuild(spark: SparkSession, stateDir: String, partCol: String,
              parts: Seq[Int], capacity: Long,
              fpp: Double): Map[Int, Shard] =
    if (parts.isEmpty) Map.empty
    else spark.read.parquet(stateDir)
      .filter(col(partCol).isin(parts: _*))
      .select(col(partCol).cast("int").as("__p"), col("__fp"))
      .repartition(col("__p")) // co-partition: no serialized filter rides the shuffle
      .groupBy(col("__p"))
      .agg(SketchExpressions.bloomAgg(col("__fp"), capacity, fpp)
        .as("bloom"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) ->
        Shard(capacity, r.getLong(2), deser(r.getAs[Array[Byte]](1))))
      .toMap

  /** Fold a batch's accepted hashes into the sidecar: build one
    * same-geometry filter per touched shard (grouped aggregate over the
    * co-partitioned hashes), merge driver-side into the loaded shards
    * (same capacity ⇒ always compatible), and append the updated rows
    * as ONE log file. `fps` must be `(partCol: int, __fp: long)` with
    * batch-distinct fps; `existing` are the batch's loaded/rebuilt
    * shards, all at `capacity`. `alsoPersist` names shards of `existing`
    * to write even when this batch added nothing to them — the probe's
    * rebuilds, which would otherwise be recomputed on every later
    * touch. Every `compactEvery` batches the log is rewritten to the
    * current lineage's latest row per part (crash-safe swap; foreign
    * lineages' rows are dropped — the loader can never use them). */
  def update(spark: SparkSession, stateDir: String, partCol: String,
             fps: DataFrame, existing: Map[Int, Shard], capacity: Long,
             fpp: Double, lineage: String, batchId: Long,
             alsoPersist: Set[Int] = Set.empty,
             compactEvery: Int = 8): Unit = {
    val batchRows = fps
      .select(col(partCol).cast("int").as("__p"), col("__fp"))
      .repartition(col("__p"))
      .groupBy(col("__p"))
      .agg(SketchExpressions.bloomAgg(col("__fp"), capacity, fpp)
        .as("bloom"), count(lit(1)).as("n"))
      .collect()
    val updated = batchRows.toIndexedSeq.map { r =>
      val p = r.getInt(0)
      val bytes = r.getAs[Array[Byte]](1)
      val n = r.getLong(2)
      existing.get(p) match {
        case Some(s) =>
          // probe-time shards are all at the batch's capacity by
          // construction ([[IngestGuard]] rebuilds any other geometry
          // before probing), so the merge cannot be incompatible
          s.bloom.mergeInPlace(deser(bytes))
          (p, capacity, s.nItems + n, ser(s.bloom))
        case None => (p, capacity, n, bytes)
      }
    }
    val carried = (alsoPersist -- updated.map(_._1)).toIndexedSeq.sorted
      .flatMap(p => existing.get(p).map(s =>
        (p, s.capacity, s.nItems, ser(s.bloom))))
    val rows = updated ++ carried
    if (rows.nonEmpty) {
      import spark.implicits._
      rows.toDF(partCol, "capacity", "n_items", "bloom")
        .withColumn("__lineage", lit(lineage))
        .withColumn("__batch_id", lit(batchId))
        .coalesce(1)
        .sortWithinPartitions(col(partCol)) // row-group stats serve loads
        .write.mode(SaveMode.Append)
        .parquet(sidecarDir(stateDir))
    }
    if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
      Streams.rewriteStore(spark, sidecarDir(stateDir))(log =>
        Relational.latestByKeys(
          log.filter(col("__lineage") <=> lit(lineage)),
          Seq(partCol), col("__batch_id")))
  }
}
