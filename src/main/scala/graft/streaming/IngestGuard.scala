package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.functions.{Hashing, SketchExpressions}
import graft.operators.TextAnalysis

/** The composed crawl-ingest guard: every arriving document passes, in
  * order, (1) the quality gate, (2) eval-set decontamination, (3) exact
  * dedup against everything ever ACCEPTED — and lands in exactly one of
  * two ledgers: `acceptedDir` (original columns) or `rejectsDir`
  * (`doc_id`, `reason`). The end-to-end "should this crawl page enter the
  * training corpus?" decision, assembled from the engine's own parts:
  *
  *  - quality + decontamination are PROJECTIONS
  *    ([[TextAnalysis.withQualityCols]]'s codegen'd signals; the
  *    [[SketchExpressions.shingleOverlap]] probe against the eval-hash
  *    plan constant) — no state, no shuffle, evaluated in the scan;
  *  - exact dedup follows [[graft.operators.Dedup.exactDedup]]'s
  *    normalized-text fingerprint: within a batch the lowest doc_id per
  *    fingerprint wins (one window over the batch's fingerprints);
  *    across batches the fingerprint store — distinct 60-bit hashes of
  *    ACCEPTED docs only, `fp_part`-partitioned parquet — is probed with
  *    a LEFT SEMI on one long, read-pruned to the bloom-positive docs'
  *    own `fp_part` partitions (a bloom-all-negative batch never reads
  *    the store at all). Rejected docs never enter the store: a
  *    later duplicate of a rejected page is judged on its own merits,
  *    because dedup is against the CORPUS, not the reject pile.
  *
  * Reject precedence is quality > contaminated > exact_dup — the cheapest
  * test that condemns a doc names it, and downstream reject analytics see
  * one reason per doc. Store discipline is the proven
  * [[SubstrDedupStream]] contract: clustered after-lookup appends,
  * (lineage, batch-id)-scoped replay guard via [[Streams.lineageId]]
  * (null-safe — adopted stores keep their history), idempotent-append
  * ledgers ([[accepted]]/[[rejects]] dedupe on replay re-emission).
  *
  * With [[Views]] enabled the guard ALSO maintains the at-ingest
  * analytics family over the ACCEPTED subset, inside the same
  * `foreachBatch` — the reference's EP2→EP3 composition (decide, then
  * dashboard the survivors; ksqldb-statements.sql:50-93) at the
  * streaming layer: a per-group count/sum view, the token-length
  * histogram ([[HistogramStream]] grid store, so percentiles are served
  * at read without touching the corpus) and the HLL distinct-fingerprint
  * view ([[HllViewStream]]). Each view is its own
  * [[Streams.foldAppendOnce]] store, so replay safety is per-store
  * batch-atomic: a crash between ledger write and a view fold replays
  * the batch, the decision recomputes identically (the fingerprint-store
  * filter excludes this (lineage, batch)'s own rows), committed views
  * skip on their commit records and the missed one applies. */
object IngestGuard {

  /** At-ingest analytics config: `groupCol` must be a column of the
    * input docs (the dashboard dimension, e.g. `source`); the histogram
    * grid is pinned up front — the streaming-sketch constraint — in
    * ACCEPTED-token units, and the HLL counts distinct normalized-text
    * fingerprints per group (= deduped corpus size per source, the
    * number the guard's own exact-dedup semantics make meaningful).
    *
    * `maxPerGroup` turns the counts view LOAD-BEARING: admission is
    * capped at that many accepted docs per group over the stream's
    * lifetime (domain caps — the mixing-control a pretraining corpus
    * applies so one crawl domain cannot flood the mix), reject reason
    * `quota`. Admission order is deterministic: batches in order,
    * `doc_id` ascending within a batch — so the decision is a pure
    * function of (pre-batch store state, batch contents), which is what
    * makes replay exact. The quota read is
    * [[Streams.readFoldStoreBefore]] — strictly-pre-batch commits only,
    * so a replayed batch never sees its own first attempt's counts — and
    * the counts store then compacts via
    * [[Streams.compactFoldStoreBefore]] (labeled prefix compaction,
    * never crossing the current batch) instead of the after-the-fold
    * compact, which would make pre-batch state unrecoverable. */
  final case class Views(baseDir: String, groupCol: String = "source",
                         histMax: Double = 4096.0, histBins: Int = 4096,
                         lgK: Int = 12, compactEvery: Int = 8,
                         maxPerGroup: Option[Long] = None)

  private[streaming] val countsSchema =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sum_tokens",
        org.apache.spark.sql.types.LongType)))

  /** Start the guard. `evalHashes` is the eval set's sorted distinct
    * shingle-hash array (build with
    * `Dedup.shingleRows(evalDocs).select("h1").distinct()` — see
    * [[graft.operators.Dedup.decontaminateScan]]); `docs` must be a
    * streaming DataFrame with at least (doc_id: long, text: string). */
  def start(docs: DataFrame, evalHashes: Array[Long], stateDir: String,
            acceptedDir: String, rejectsDir: String, checkpoint: String,
            minTokens: Int = 5, maxPunctRatio: Double = 0.2,
            n: Int = 3, expectedDocs: Long = 1L << 22,
            fpp: Double = 0.01, views: Option[Views] = None): StreamingQuery = {
    views.foreach(v => require(docs.columns.contains(v.groupCol),
      s"Views.groupCol '${v.groupCol}' is not a column of the input docs"))
    val lineage = Streams.lineageId(
      docs.sparkSession.sparkContext.hadoopConfiguration, checkpoint)
    val inputCols = docs.columns.toIndexedSeq
    // the fp store through the shared skeleton — a no-op format hook
    // (fingerprints carry no geometry, and refusing historically
    // unmarked guard stores would break adoption), used for the
    // crash-replay-guarded append only; the probe keeps its own
    // pruned-read path below
    val fpStore = new Streams.SideStore(stateDir, "fp_part",
      "guard-fps/v1", "IngestGuard", 0, 0, checkFormat = (_, _) => ())
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val statePath = new org.apache.hadoop.fs.Path(stateDir)
        val fs = statePath
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        Streams.recoverCompaction(fs, stateDir)
        // one scan projection computes every per-doc signal
        val scored = TextAnalysis.withQualityCols(batch)
          .withColumn("__overlap",
            SketchExpressions.shingleOverlap(col("text"), evalHashes, n))
          .withColumn("__fp", expr(Hashing.hash64(
            "regexp_replace(trim(lower(text)), '\\\\s+', ' ')")))
          .localCheckpoint(false)
        val quality = col("n_tokens") >= minTokens &&
          col("punct_ratio") <= maxPunctRatio
        // within-batch: lowest doc_id per fingerprint wins — ranked only
        // over rows that pass the quality and contamination gates, because
        // dedup is against the CORPUS, not the reject pile: if a doc's
        // lower-doc_id same-fingerprint twin was itself rejected, no doc
        // with that fingerprint entered the corpus and this one must not
        // be charged as exact_dup. Adding the gate to the partition key
        // keeps the exchange on __fp unchanged; gate-failing rows rank
        // within their own partition but never reach the exact_dup branch
        // (their reason is already quality/contaminated).
        val gate = quality && col("__overlap") === 0
        val rn = row_number().over(
          Window.partitionBy(col("__fp"), gate).orderBy(col("doc_id")))
        // cross-batch: fingerprint already accepted in an earlier batch.
        // Bloom sidecar prefilter (shared [[Streams]] sidecar, like the
        // gram store): bloom-NEGATIVE fingerprints are definitively new —
        // no false negatives — so the store is consulted only for the
        // batch's bloom-POSITIVE docs. The store (right) side is pruned
        // to those docs' fp_part partitions (bounded ≤256 collect — the
        // SubstrDedupStream/MinHashDupStream contract), and when the
        // batch has NO bloom positives (the common case for fresh
        // content) the store is never read at all. Membership is then
        // confirmed by a LEFT SEMI of the pruned slice against the
        // batch's candidate fps (broadcast — bounded by the batch's own
        // distinct positives), so no microbatch ever pays a corpus-sized
        // scan, distinct, or shuffle; a Bloom false positive costs a
        // pruned confirm read, never a wrongly-rejected doc. Replay
        // guard: rows this (lineage, batch) wrote before a crash are not
        // history.
        val bloom = Streams.readOrRebuildBloomSidecar(
          spark, fs, stateDir, "__fp", expectedDocs, fpp)
        val probeGate = bloom match {
          case Some(b) =>
            SketchExpressions.bloomMightContain(col("__fp"), b)
          case None => lit(true)
        }
        val posParts =
          if (fs.exists(statePath))
            scored.filter(probeGate)
              .select(pmod(col("__fp"), lit(256)).cast("int").as("p"))
              .distinct().collect().map(_.getInt(0)) // bounded ≤256
          else Array.empty[Int]
        val withRn = scored.withColumn("__rn", rn)
        val probed =
          if (posParts.isEmpty) withRn.withColumn("__seen", lit(false))
          else {
            val candidateFps = scored.filter(probeGate)
              .select(col("__fp")).distinct()
            val seenFps = spark.read.parquet(stateDir)
              .filter(col("fp_part").isin(posParts.toIndexedSeq: _*))
              .filter(!(col("__lineage") <=> lit(lineage) &&
                col("__batch_id") === lit(batchId)))
              .select(col("__fp"))
              .join(broadcast(candidateFps), Seq("__fp"), "left_semi")
              // replay-duplicated store rows would fan out the join back
              // onto the batch; the distinct is over ≤ the batch's own
              // candidate fps, never the corpus
              .distinct()
              .withColumn("__seen", lit(true))
            withRn.join(broadcast(seenFps), Seq("__fp"), "left")
          }
        val isDup = coalesce(col("__seen"), lit(false)) || col("__rn") > 1
        // per-group admission quota (Views.maxPerGroup): a doc that
        // survives every content gate still lands `quota` once its group
        // has admitted `cap` docs. Prior counts come from the counts
        // store's strictly-pre-batch commits (replay-exact: a crashed
        // batch's own fold is excluded on retry), the batch's own
        // survivors are ranked doc_id-ascending within the group (the
        // survivor predicate rides the partition key, like __rn's gate —
        // non-survivors rank in their own partition and never reach the
        // quota branch), and prior + rank > cap condemns the overflow.
        // The prior frame is ≤ n_groups rows — broadcast.
        val withQuota = (for { v <- views; cap <- v.maxPerGroup } yield {
          val countsDir = s"${v.baseDir}/counts"
          if (v.compactEvery > 0 && batchId % v.compactEvery == 0)
            Streams.compactFoldStoreBefore(spark, countsDir, lineage,
              batchId)(log => log.groupBy(col("grp"))
                .agg(sum(col("cnt")).as("cnt"),
                  sum(col("sum_tokens")).as("sum_tokens")))
          val prior = Streams.readFoldStoreBefore(spark, countsDir,
              countsSchema, lineage, batchId)
            .groupBy(col("grp")).agg(sum(col("cnt")).as("__admitted"))
            .withColumnRenamed("grp", "__qgrp")
          val survivor = quality && col("__overlap") === 0 && !isDup
          val rq = row_number().over(
            Window.partitionBy(col(v.groupCol).cast("string"), survivor)
              .orderBy(col("doc_id")))
          probed.join(broadcast(prior),
              col(v.groupCol).cast("string") <=> col("__qgrp"), "left")
            .drop("__qgrp")
            .withColumn("__over_quota", survivor &&
              coalesce(col("__admitted"), lit(0L)) + rq > cap)
            .drop("__admitted")
            // when the fingerprint's within-batch winner is itself
            // condemned by quota, the fingerprint never entered the
            // corpus — charging its same-batch followers exact_dup would
            // violate "dedup is against the CORPUS" (the gate comment's
            // invariant). They are charged `quota` instead: the honest
            // reason (the fp's slot was quota-denied), deliberately
            // WITHOUT re-admission — promoting a follower would shift
            // later quota ranks in ITS group, whose winners could then
            // overflow and free other fps: a fixpoint, not a window. The
            // deviation is confined to multi-copy fps arriving in the
            // same batch as a quota overflow and biases toward
            // under-admission, never corpus corruption; StreamingSpec
            // pins it ("quota-rejected winner does not convict ...").
            .withColumn("__winner_quota",
              max(when(col("__rn") === 1, col("__over_quota"))
                .otherwise(lit(false)))
                .over(Window.partitionBy(col("__fp"), gate)))
        }).getOrElse(probed.withColumn("__over_quota", lit(false))
          .withColumn("__winner_quota", lit(false)))
        val judged = withQuota
          .withColumn("reason",
            when(!quality, "quality")
              .when(col("__overlap") > 0, "contaminated")
              .when(coalesce(col("__seen"), lit(false)), "exact_dup")
              .when(col("__rn") > 1 && col("__winner_quota"), "quota")
              .when(col("__rn") > 1, "exact_dup")
              .when(col("__over_quota"), "quota"))
          .localCheckpoint(false)
        judged.filter(col("reason").isNotNull)
          .select(col("doc_id"), col("reason"))
          .withColumn("__batch_id", lit(batchId))
          .write.mode(SaveMode.Append).parquet(rejectsDir)
        val accepted = judged.filter(col("reason").isNull)
        accepted
          .select(inputCols.map(col): _*)
          .withColumn("__batch_id", lit(batchId))
          .write.mode(SaveMode.Append).parquet(acceptedDir)
        // grow the store AFTER the lookup, accepted fingerprints only —
        // through the shared crash-replay guard, so a replayed batch
        // no longer re-appends its fps (the probe's lineage filter and
        // seenFps distinct already kept LOOKUPS exact; this keeps the
        // store itself single-copy)
        // repair = false: the guard's batch path must be able to skip
        // the store entirely (bloom-all-negative), so the one-batch
        // append-to-sidecar crash window takes a duplicate copy instead
        // of an anti-join read — the probe's lineage filter + seenFps
        // distinct already absorb store duplicates exactly
        fpStore.appendBatchOnce(spark,
          accepted.select(col("__fp")).distinct()
            .withColumn("fp_part", pmod(col("__fp"), lit(256)).cast("int"))
            .withColumn("__lineage", lit(lineage)),
          lineage, batchId, Seq("__fp"), repair = false)
        // a batch can accept NOTHING (every doc rejected) — then there is
        // nothing to add and the existing sidecar stays as-is
        Streams.bloomOfNonEmpty(accepted.select(col("__fp")), "__fp",
          expectedDocs, fpp).foreach { batchBloom =>
          Streams.writeBloomSidecar(fs, stateDir, bloom match {
            case Some(prev) =>
              try prev.mergeInPlace(batchBloom)
              catch {
                case _: org.apache.spark.util.sketch.IncompatibleMergeException =>
                  spark.read.parquet(stateDir)
                    .stat.bloomFilter("__fp", expectedDocs, fpp)
              }
            case None => batchBloom
          })
        }
        // at-ingest analytics over the survivors: three maintained views,
        // each fed from the already-materialized `judged` checkpoint (no
        // corpus re-read), each with its own batch-atomic commit record
        views.foreach { v =>
          val acc = accepted.select(
            col(v.groupCol).cast("string").as("grp"),
            col("n_tokens").cast("double").as("n_tokens"), col("__fp"))
          // quota mode compacts via the pre-fold labeled prefix instead
          // (see Views scaladoc) — the after-the-fold compact would fold
          // THIS batch into a partition the pre-batch read can't split
          Streams.foldAppendOnce(spark, s"${v.baseDir}/counts", lineage,
            batchId, s"guard-counts/grp=${v.groupCol}", "IngestGuard.Views",
            if (v.maxPerGroup.isDefined) 0 else v.compactEvery) {
            acc.groupBy(col("grp")).agg(count(lit(1)).as("cnt"),
              sum(col("n_tokens")).cast("long").as("sum_tokens"))
          } { log =>
            log.groupBy(col("grp")).agg(sum(col("cnt")).as("cnt"),
              sum(col("sum_tokens")).as("sum_tokens"))
          }
          HistogramStream.applyBatch(acc, s"${v.baseDir}/hist", lineage,
            batchId, "grp", "n_tokens", 0.0, v.histMax, v.histBins,
            v.compactEvery)
          HllViewStream.applyBatch(acc, s"${v.baseDir}/hll", lineage,
            batchId, "grp", "__fp", v.lgK, v.compactEvery)
        }
        Seq(scored, judged).foreach(df =>
          org.apache.spark.sql.GraftColumnBridge.checkpointRdd(df)
            .foreach(_.unpersist(false)))
        ()
      }
      .start()
  }

  /** Accepted corpus so far (idempotent-append: replays re-emit rows). */
  def accepted(spark: org.apache.spark.sql.SparkSession,
               acceptedDir: String): DataFrame =
    spark.read.parquet(acceptedDir).drop("__batch_id").distinct()

  /** Reject ledger with one reason per doc. */
  def rejects(spark: org.apache.spark.sql.SparkSession,
              rejectsDir: String): DataFrame =
    spark.read.parquet(rejectsDir).select("doc_id", "reason").distinct()

  /** Accepted-corpus count/sum per group, as of the last committed batch
    * (view-sized read: the fold log re-aggregated, never the corpus). */
  def viewCounts(spark: org.apache.spark.sql.SparkSession,
                 viewsBase: String): DataFrame =
    Streams.readFoldStore(spark, s"$viewsBase/counts", countsSchema)
      .groupBy(col("grp"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_tokens")).as("sum_tokens"))

  /** Accepted-corpus token-length percentiles per group, served from the
    * histogram store's own grid marker. */
  def viewQuantiles(spark: org.apache.spark.sql.SparkSession,
                    viewsBase: String,
                    qs: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame =
    HistogramStream.quantiles(spark, s"$viewsBase/hist", qs)

  /** Distinct accepted fingerprints per group (HLL estimate) — the
    * deduped corpus size each source contributed. */
  def viewDistinct(spark: org.apache.spark.sql.SparkSession,
                   viewsBase: String): DataFrame =
    graft.functions.HllView.distinctBySource(
      HllViewStream.view(spark, s"$viewsBase/hll"))
}
