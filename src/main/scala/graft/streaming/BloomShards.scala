package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.SketchExpressions

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
  *  - a shard missing for a partition that HAS store data (adoption
  *    from the pre-shard global-sidecar layout, or a torn sidecar
  *    write) is indistinguishable from stale and is rebuilt the same
  *    way — self-healing, like the global sidecar it replaces.
  *
  * Layout: `<stateDir>.__bloomparts/` — parquet partitioned by the
  * store's own partition column, one row per shard:
  * `(partCol, capacity, n_items, bloom)`. Writes overwrite ONLY the
  * touched partitions (dynamic partition overwrite); a crash mid-write
  * leaves at worst a missing shard row, which the staleness check
  * repairs on next touch. `n_items` is an UPPER estimate (a replayed
  * batch whose store append was guard-skipped still re-merges its
  * items), so over-counting can only trigger an EARLY rebuild — which
  * resets it from the store's actual row count. Correctness never
  * depends on the sidecar: filters are rebuilt from the store, and a
  * Bloom false positive costs a pruned confirm read, never a wrongly
  * rejected document.
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

  /** Sidecar rows for `parts` only (partition-pruned read; the sidecar
    * is partitioned by the same key as the store). Empty map when the
    * sidecar doesn't exist yet. */
  def load(spark: SparkSession, stateDir: String, partCol: String,
           parts: Seq[Int]): Map[Int, Shard] = {
    val d = new org.apache.hadoop.fs.Path(sidecarDir(stateDir))
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (parts.isEmpty || !fs.exists(d)) Map.empty
    else spark.read.parquet(sidecarDir(stateDir))
      .filter(col(partCol).isin(parts: _*))
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
    * (same capacity ⇒ always compatible), and overwrite ONLY the
    * touched partition rows. `fps` must be `(partCol: int, __fp: long)`
    * with batch-distinct fps; `existing` are the batch's loaded/rebuilt
    * shards, all at `capacity`. `alsoPersist` names shards of `existing`
    * to write even when this batch added nothing to them — the probe's
    * rebuilds, which would otherwise be recomputed on every later
    * touch. */
  def update(spark: SparkSession, stateDir: String, partCol: String,
             fps: DataFrame, existing: Map[Int, Shard], capacity: Long,
             fpp: Double, alsoPersist: Set[Int] = Set.empty): Unit = {
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
    if (rows.isEmpty) return
    import spark.implicits._
    rows.toDF(partCol, "capacity", "n_items", "bloom")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(sidecarDir(stateDir))
  }
}
