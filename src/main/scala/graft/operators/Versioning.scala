package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Corpus snapshot versioning: diff two corpus snapshots into per-document
  * change records — the bookkeeping step between two crawls / two cleaning
  * runs of a training corpus ("what changed since the frozen v1 mixture?").
  *
  * The reference pipeline has the same concern in CDC form (Debezium emits
  * row-level before/after changes, `/root/reference/ksqldb-statements.sql:19-38`);
  * this is the batch analog over whole corpus snapshots, where no changelog
  * was captured and the diff must be recomputed from content.
  *
  * Scale design: each side is reduced to `(doc_id, fp)` — an 8-byte key and
  * a 64-bit content fingerprint — BEFORE the join, so the full-outer join
  * shuffles ~16 bytes/doc and document text never crosses the wire. At
  * 100 TB of text that is a few hundred GB of shuffle, the same shape as
  * [[Dedup.exactDedup]]. The status column is a codegen'd CASE over null
  * sides; no window, no second scan of either snapshot.
  */
object Versioning {

  /** One row per doc_id present in either snapshot, with its change status:
    * `added` (new only), `removed` (old only), `changed` (both, content
    * fingerprint differs), `unchanged` (both, same fingerprint).
    *
    * Fingerprint is the md5-derived 64-bit content hash ([[Hashing.hash64]])
    * so the DuckDB oracle reproduces it bit-for-bit.
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def fingerprints(df: DataFrame, idOut: String, fpOut: String): DataFrame =
      df.select(col("doc_id").as(idOut),
        expr(Hashing.hash64("text")).as(fpOut))
    val o = fingerprints(oldDocs, "old_id", "old_fp")
    val n = fingerprints(newDocs, "new_id", "new_fp")
    o.join(n, col("old_id") === col("new_id"), "full_outer")
      .select(
        coalesce(col("old_id"), col("new_id")).as("doc_id"),
        when(col("old_id").isNull, lit("added"))
          .when(col("new_id").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Rollup of [[corpusDiff]]: one row per status with counts — the summary
    * line a snapshot-promotion job logs before swapping v1 → v2. */
  def diffSummary(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    corpusDiff(oldDocs, newDocs)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"))

  /** Embedding drift between two snapshots of a labeled vector corpus —
    * the monitoring twin of [[corpusDiff]] for the EMBEDDING side of a
    * training mixture ("did re-embedding / re-crawling move the class
    * geometry?"): per label, both snapshot centroids and the L2 distance
    * between them, plus the size delta.
    *
    * Scale shape: each side collapses to (label, dim, mean) via ONE
    * zipped posexplode + grouped aggregate — labels × dim rows (a few
    * thousand), however many billions of vectors went in; the centroid
    * join is on that tiny table. Per-dim means ride DECIMAL(28,9) sums
    * (float avg is association-order-dependent across partitionings —
    * repo convention), are rounded to 6dp, and the squared diffs
    * re-enter DECIMAL before the final per-label sum, so the reported
    * drift is bit-identical at any parallelism and engine. */
  def embeddingDrift(oldEmb: DataFrame, newEmb: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def centroids(df: DataFrame, pre: String): DataFrame =
      df.select(col("label"), posexplode(col("embedding")))
        .select(col("label"), col("pos").as("dim"),
          col("col").cast("double").as("x"))
        .groupBy(col("label"), col("dim"))
        .agg(round(sum(round(col("x"), 9).cast(DecimalType(28, 9)))
          .cast("double") / count(lit(1)), 6).as(s"${pre}_mean"),
          count(lit(1)).as(s"${pre}_n"))
    val o = centroids(oldEmb, "old")
    val n = centroids(newEmb, "new")
    o.join(n, Seq("label", "dim"))
      .select(col("label"),
        round((col("old_mean") - col("new_mean"))
          * (col("old_mean") - col("new_mean")), 9)
          .cast(DecimalType(28, 9)).as("sq"),
        col("old_n"), col("new_n"))
      .groupBy(col("label"))
      .agg(round(sqrt(sum(col("sq")).cast("double")), 6).as("centroid_l2"),
        (max(col("new_n")) - max(col("old_n"))).as("size_delta"))
      .orderBy(col("label"))
  }
}
