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
  *    ACCEPTED docs only, `fp_part`-partitioned parquet (partition
  *    count pinned by a format marker), files SORTED on `__fp` — is
  *    probed behind per-partition Bloom shards ([[BloomShards]]):
  *    a bloom-all-negative batch never reads the store at all, and the
  *    positives' membership is confirmed by a read pruned to their own
  *    partitions, with the candidate fps pushed as point predicates so
  *    the sorted files' row-group stats bound the read by the
  *    CANDIDATES, not the partitions (see [[start]]'s geometry notes).
  *    Rejected docs never enter the store: a
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

  /** Optional at-ingest NEAR-duplicate stage — the reference's EP2
    * composition taken to the corpus-quality argument of Lee et al. '21
    * ("Deduplicating Training Data Makes Language Models Better"): a
    * crawl pipeline should reject near-copies (reposts, boilerplate
    * rewraps, light edits), not just byte-copies. The modality is
    * [[MinHashDupStream]]'s band store composed INTO the guard as a
    * fifth reject reason `near_dup` — precedence after `exact_dup`
    * (the cheaper, certain test names the doc first) and before
    * `quota` (a near-copy must not consume an admission slot).
    *
    * A doc is `near_dup` when a MinHash LSH band of its text collides
    * with (a) a band of anything ever ACCEPTED (the band store — like
    * the fingerprint store, rejected docs never enter it), or (b) a
    * band of a lower-doc_id same-batch doc that itself survived the
    * exact level AND is not a store-near-dup. Same-batch CHAINS are
    * resolved one level only (if B near-dups accepted A, and C collides
    * only with B, C is still charged `near_dup`), and a same-batch
    * collision stands even when the kept side is LATER rejected by
    * quota (quota is decided after near-dup under the precedence, and
    * re-admitting C would shift quota ranks in its group — the same
    * fixpoint the quota-twin rule refuses): exact sequential admission
    * within a batch is a graph fixpoint, not a window — both deviations
    * are batch-confined and bias toward over-rejection, never corpus
    * corruption, the mirror of the quota-twin rule's pinned
    * under-admission bias. (A same-batch fp-TWIN of a near-dup winner
    * is the one case resolved exactly: identical fp ⇒ identical text ⇒
    * the twin near-dups whatever the winner did, reason `near_dup`.)
    *
    * `minEst` gates collisions on the signature-agreement Jaccard
    * estimate (E[est] = J, Broder '97 — [[JaccardDupStream]]'s scoring):
    * None rejects on ANY band collision (max recall); Some(t) rejects
    * only pairs with est ≥ t. The store carries the k-long signature
    * per band row either way, so `minEst` is a restart-safe QUERY
    * parameter, not store geometry — `(k, bands, n, bandParts)` are the
    * geometry and are format-marked.
    *
    * Scale geometry (round-14 — the fp store's round-13 playbook applied
    * to this store, which like it can never retention-prune): `bandParts`
    * sets the band store's partition count AT CREATION (format-marked;
    * pre-round-14 stores were all written 64-way and adopt as such);
    * appends are sorted on `band_key` within each file; the probe is
    * gated by per-partition Bloom sidecars over `xxhash64(band_key)`
    * ([[BloomShards]] — the same cache/delta/rebuild machinery as the fp
    * store), and with at most `maxKeyPushdown` distinct bloom-positive
    * band keys the candidates are pushed into the store scan as string
    * point predicates, so the sorted files' row-group stats bound the
    * read by the CANDIDATES' row groups, not the partitions. Past the
    * cap the partition-pruned join takes over, unhinted for AQE. */
  final case class NearDup(stateDir: String, k: Int = 16, bands: Int = 4,
                           n: Int = 3, minEst: Option[Double] = None,
                           bandParts: Int = LegacyBandParts,
                           maxKeyPushdown: Int = 64) {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    require(bandParts > 0, "bandParts must be positive")
    require(maxKeyPushdown >= 0, "maxKeyPushdown must be >= 0")
    minEst.foreach(t => require(t >= 0.0 && t <= 1.0,
      "minEst must be in [0, 1]"))
  }

  private val LegacyBandParts = 64

  /** Band+signature rows of `docs` (doc_id, text) — the
    * [[JaccardDupStream]] row shape (signature riding each band row so
    * the estimate is computed inside the band join, no second join back
    * to a signature table). Package-private: specs forge crashed-store
    * states from the same builder the guard probes with. */
  private[graft] def nearDupRows(docs: DataFrame, k: Int, bands: Int,
                                 n: Int,
                                 parts: Int = LegacyBandParts): DataFrame =
    graft.operators.Dedup.bandSigRows(docs, k, bands, n)
      .withColumn("band_part",
        pmod(xxhash64(col("band_key")), lit(parts)).cast("int"))

  private def nearDupFormatTag(nd: NearDup): String =
    s"guard-neardup/v2/k=${nd.k}/bands=${nd.bands}/n=${nd.n}" +
      s"/parts=${nd.bandParts}"

  /** The band store's marker check with v1 ADOPTION: pre-round-14
    * markers pin `(k, bands, n)` but not the partition count — those
    * stores were all written [[LegacyBandParts]]-way, so a matching v1
    * marker upgrades in place to the v2 tag iff the configured
    * `bandParts` is the legacy count; any other configuration falls
    * through to the strict check and fails fast naming both tags
    * (probing a store partitioned differently than `pmod(xxhash64(key),
    * parts)` expects would silently MISS near-dups — false negatives,
    * the unabsorbable direction). */
  private[streaming] def checkNdFormat(
      fs: org.apache.hadoop.fs.FileSystem, nd: NearDup): Unit = {
    val legacy = s"guard-neardup/v1/k=${nd.k}/bands=${nd.bands}/n=${nd.n}"
    Streams.checkStoreFormatUpgrade(fs, nd.stateDir, nearDupFormatTag(nd),
      legacy, nd.bandParts == LegacyBandParts, "IngestGuard.NearDup")
  }

  private[streaming] val countsSchema =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sum_tokens",
        org.apache.spark.sql.types.LongType)))

  /** The fp store's format marker: the partition count IS the store's
    * geometry (the probe's partition pruning, the Bloom shard index, and
    * the layout key all derive from it), so it is pinned at store
    * creation and a restart configured differently fails fast. A store
    * directory with contents but NO marker is a legacy (pre-round-13)
    * guard store: those were all written 256-way, so they adopt as
    * `parts=256` — under any other configured count adoption is refused
    * rather than silently probing the wrong slices. */
  private[streaming] def checkFpFormat(
      fs: org.apache.hadoop.fs.FileSystem, stateDir: String,
      fpParts: Int): Unit = {
    val expected = s"guard-fps/v2/parts=$fpParts"
    if (Streams.readStoreFormat(fs, stateDir).isEmpty &&
        fs.exists(new org.apache.hadoop.fs.Path(stateDir))) {
      require(fpParts == LegacyFpParts,
        s"fingerprint store at $stateDir predates the geometry marker " +
          s"and was written $LegacyFpParts-way; configured fpParts=" +
          s"$fpParts cannot adopt it — restart with " +
          s"fpParts=$LegacyFpParts or point at a fresh stateDir")
      // adoption writes a marker ONTO the directory, so first prove it
      // actually looks like a legacy guard store (fp_part=N partition
      // dirs, nothing else data-shaped) — pointing at a wrong path must
      // refuse, not silently claim foreign data as the fp store
      // (round-13 advice)
      val entries = fs.listStatus(
        new org.apache.hadoop.fs.Path(stateDir)).toIndexedSeq
        .map(s => (s.getPath.getName, s.isDirectory))
        .filterNot { case (n, _) => n.startsWith("_") || n.startsWith(".") }
      val looksLegacy = entries.nonEmpty && entries.forall { case (n, d) =>
        d && n.startsWith("fp_part=") &&
          n.stripPrefix("fp_part=").toIntOption.exists(p =>
            p >= 0 && p < LegacyFpParts)
      }
      require(looksLegacy,
        s"directory $stateDir has contents but no format marker and does " +
          "not look like a legacy guard fingerprint store (expected only " +
          "fp_part=N partition directories) — refusing to adopt it")
      // pin the adopted geometry so the NEXT restart checks it
      val out = fs.create(
        new org.apache.hadoop.fs.Path(stateDir + ".__format"), true)
      try out.write(
        expected.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } else Streams.checkStoreFormat(fs, stateDir, expected, "IngestGuard")
  }

  private val LegacyFpParts = 256

  /** Start the guard. `evalHashes` is the eval set's sorted distinct
    * shingle-hash array (build with
    * `Dedup.shingleRows(evalDocs).select("h1").distinct()` — see
    * [[graft.operators.Dedup.decontaminateScan]]); `docs` must be a
    * streaming DataFrame with at least (doc_id: long, text: string).
    *
    * Scale geometry (round-13): `fpParts` sets the fingerprint store's
    * partition count AT CREATION (format-marked; size it so one
    * partition's rows fit a comfortable pruned read at the deployment's
    * corpus ceiling — corpus/fpParts rows each). Appends are sorted on
    * `__fp` within each file, so the probe's candidate fingerprints —
    * pushed into the scan as point predicates when the batch has at most
    * `maxFpPushdown` distinct bloom-positive fps — prune by parquet
    * row-group/page statistics INSIDE the partition: probe IO is
    * bounded by the candidates' own row groups, not the partition.
    * (Point predicates, not parquet's native large-set `In`: its
    * statistics filter prunes only on the candidate SET's min..max —
    * useless for uniform hashes — so the session's
    * `spark.sql.parquet.pushdown.inFilterThreshold` is raised to the
    * cap at start, making Spark push or-of-eq, which prunes per value.
    * NOTE this raise is SESSION-GLOBAL and lives past the query — the
    * conf has no per-read form, so every other query on a shared
    * session plans In-pushdown with the raised threshold from then on;
    * the default cap of 64 is the documented safe ceiling (round-13
    * measurement: or-of-eq pruning degrades past ~64 values), raise it
    * consciously on shared sessions. The cap stays small deliberately:
    * per-value pruning only wins while candidates number fewer than the
    * partition's row groups — a dup-heavy batch past the cap gains
    * nothing from point reads and falls back to the pruned-partition
    * semi-join, unhinted so AQE sizes the join.) The Bloom prefilter is
    * per-partition [[BloomShards]] sidecars — each sized to its slice
    * (`expectedDocs / fpParts` floor-bounded), CACHED in the driver
    * across batches (the store is single-writer, so the in-memory map
    * is authoritative: the log is read only on a run's first touch of a
    * partition), fed per batch by batch-proportional DELTA rows rather
    * than full filter rewrites, and rebuilt from one store partition on
    * saturation with geometric capacity growth — so no driver-held
    * filter ever has to be sized for the whole corpus, a saturated
    * filter can never silently degrade the probe to read-everything,
    * and per-batch sidecar IO is proportional to the batch.
    * `maxBloomLoadBytes` bounds what a single batch may LOAD for its
    * uncached shards (a restart's full-touch first batch at a corpus
    * too big to re-load wholesale): each batch WARMS up to the budget
    * and defers the rest — candidates in the deferred partitions are
    * treated as bloom-positive and take the pruned+pushed confirm read,
    * which is exact without the Bloom — so the gate recovers fully in
    * ~⌈sidecarBytes/budget⌉ batches after any restart instead of
    * skipping forever, while delta maintenance continues for deferred
    * parts, so deferral never starves the sidecars into false
    * negatives.
    *
    * SIZING RULE (`maxBloomCacheBytes` vs the corpus): warming
    * CONVERGES only if the cache can hold the filters of the parts a
    * batch actually touches — size `maxBloomCacheBytes` ≥ the live
    * WORKING SET's filter bytes (for a full-touch stream, the whole
    * sidecar: ~1.2 bytes/fingerprint at fpp=0.01, so ~12 GB at 10¹⁰
    * accepted docs). A full-touch stream whose sidecar exceeds the
    * cache budget instead reaches a PERMANENT warming steady state:
    * each batch loads up to `maxBloomLoadBytes`, evicts LRU, and
    * defers the rest, forever — exact throughout (the deferred
    * partitions' candidates take the confirm read), but a standing
    * per-batch reload + confirm cost that looks identical to a
    * converging warm-up in per-batch behavior. The telemetry that
    * tells them apart is [[BloomShards.lastWarming]] /
    * [[graft.api.Engine.registerGuardWarming]] (and the stable
    * `BloomShards.warming` log line): `deferred_parts` reaching 0 is a
    * warm-up completing; never reaching 0 means grow the cache or
    * shrink the per-batch touched set. Partial-touch workloads — the
    * design assumption at corpus scale — hold their working set and
    * are unaffected. */
  def start(docs: DataFrame, evalHashes: Array[Long], stateDir: String,
            acceptedDir: String, rejectsDir: String, checkpoint: String,
            minTokens: Int = 5, maxPunctRatio: Double = 0.2,
            n: Int = 3, expectedDocs: Long = 1L << 22,
            fpp: Double = 0.01, views: Option[Views] = None,
            fpParts: Int = LegacyFpParts,
            maxFpPushdown: Int = 64,
            nearDup: Option[NearDup] = None,
            maxBloomLoadBytes: Long = 2L << 30,
            maxBloomCacheBytes: Long = 8L << 30): StreamingQuery = {
    require(fpParts > 0, "fpParts must be positive")
    require(maxFpPushdown >= 0, "maxFpPushdown must be >= 0")
    require(maxBloomLoadBytes > 0, "maxBloomLoadBytes must be positive")
    require(maxBloomCacheBytes > 0, "maxBloomCacheBytes must be positive")
    views.foreach(v => require(docs.columns.contains(v.groupCol),
      s"Views.groupCol '${v.groupCol}' is not a column of the input docs"))
    val lineage = Streams.lineageId(
      docs.sparkSession.sparkContext.hadoopConfiguration, checkpoint)
    val inputCols = docs.columns.toIndexedSeq
    val sliceCap0 = math.max(expectedDocs / fpParts, 64L)
    // candidate point predicates must reach parquet as or-of-eq (see
    // the scaladoc, incl. the session-global caveat); raise the session
    // threshold to the larger cap — never lower an existing bigger one
    val sess = docs.sparkSession
    val inThreshold = "spark.sql.parquet.pushdown.inFilterThreshold"
    val pushCap = math.max(maxFpPushdown,
      nearDup.map(_.maxKeyPushdown).getOrElse(0))
    if (sess.conf.get(inThreshold, "10").toInt < pushCap)
      sess.conf.set(inThreshold, pushCap.toString)
    // the fp store through the shared skeleton: geometry-marked (legacy
    // stores adopt, see [[checkFpFormat]]), appends sorted on __fp so
    // in-partition row-group stats serve the probe's pushed candidates;
    // used for the crash-replay-guarded append — the probe keeps its
    // own pruned-read path below
    val fpStore = new Streams.SideStore(stateDir, "fp_part",
      s"guard-fps/v2/parts=$fpParts", "IngestGuard", 0, 0,
      checkFormat = (_, fs) => checkFpFormat(fs, stateDir, fpParts),
      sortCols = Seq("__fp"))
    // each store's shard cache gets its own LRU byte budget: the driver
    // must never end up holding the whole corpus filter (the 1e11-fps
    // infeasibility the sharding exists to avoid) — evicted shards
    // reload from the log on next touch
    val fpBloomCache = new BloomShards.Cache(maxBloomCacheBytes)
    // the optional near-dup band store — same skeleton, same geometry
    // discipline as the fp store's (marker-pinned parts with legacy
    // adoption, band_key-sorted files for pushed-candidate row-group
    // pruning, per-part Bloom sidecars); accepted docs' bands only
    val ndStore: Option[Streams.SideStore] = nearDup.map(nd =>
      new Streams.SideStore(nd.stateDir, "band_part",
        nearDupFormatTag(nd), "IngestGuard.NearDup", 0, 0,
        checkFormat = (_, fs) => checkNdFormat(fs, nd),
        sortCols = Seq("band_key")))
    val ndBloomCache = new BloomShards.Cache(maxBloomCacheBytes)
    val ndSliceCap0 = nearDup.map(nd => math.max(
      expectedDocs * nd.bands / nd.bandParts, 64L)).getOrElse(64L)
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val statePath = new org.apache.hadoop.fs.Path(stateDir)
        val fs = fpStore.ensureReady(spark) // recovery + geometry check
        // one scan projection computes every per-doc signal
        val scored = TextAnalysis.withQualityCols(batch)
          .withColumn("__overlap",
            SketchExpressions.shingleOverlap(col("text"), evalHashes, n))
          .withColumn("__fp", fpExpr)
          .withColumn("fp_part",
            pmod(col("__fp"), lit(fpParts)).cast("int"))
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
        // Per-partition Bloom prefilter ([[BloomShards]]): only docs that
        // can ever be charged exact_dup — the GATE-passing ones
        // (quality/contamination rejects keep their cheaper reason under
        // the precedence, so probing for them is dead work) — determine
        // the touched fp_part slices; shards are loaded for exactly
        // those, any slice whose shard is stale (missing for live store
        // data, under-capacity after a geometry migration, or saturated
        // past its tracked n_items) is rebuilt from ITS store partition
        // in one grouped job, and bloom-NEGATIVE fingerprints are
        // definitively new (no false negatives). A batch with NO
        // bloom-positive gate-passers never reads the store at all — the
        // fresh-content common case. Membership of the positives is then
        // CONFIRMED against the store pruned to their partitions; with at
        // most maxFpPushdown candidates the fps are pushed into the scan
        // as point predicates, so the sorted store's row-group/page stats
        // bound the read by the candidates' own row groups — probe IO
        // sublinear in store size even inside a partition. Above the cap
        // (a pathologically dup-heavy batch) the pruned semi-join form
        // takes over, unhinted so AQE picks the join strategy instead of
        // force-broadcasting a batch-sized set. A Bloom false positive
        // costs a pruned confirm read, never a wrongly-rejected doc.
        // Replay guard: rows this (lineage, batch) wrote before a crash
        // are not history.
        val liveParts: Set[Int] =
          if (!fs.exists(statePath)) Set.empty
          else fs.listStatus(statePath).toIndexedSeq
            .map(_.getPath.getName)
            .filter(_.startsWith("fp_part="))
            .flatMap(_.stripPrefix("fp_part=").toIntOption).toSet
        val touchedParts: Seq[Int] =
          if (liveParts.isEmpty) Nil
          else scored.filter(gate).select(col("fp_part"))
            .distinct().collect().map(_.getInt(0)) // bounded ≤ fpParts
            .toIndexedSeq.filter(liveParts)
        // cache-first shard prep ([[BloomShards.prepare]]): first-touch
        // parts load base+delta rows from the log UP TO the byte budget
        // (the rest are DEFERRED — treated bloom-positive, exact via the
        // confirm read, and warmed by later batches), live parts with no
        // loadable shard are counted then rebuilt at a covering
        // capacity, saturated shards rebuild at a covering doubled
        // capacity — all per shard, nothing global.
        val prep = BloomShards.prepare(spark, stateDir, "fp_part",
          col("__fp"), lineage, touchedParts, fpBloomCache, sliceCap0,
          fpp, maxBloomLoadBytes)
        val probeGate =
          BloomShards.gate(col("__fp"), col("fp_part"), prep, fpParts)
        val positives = scored.filter(gate && probeGate)
        val posParts =
          if (prep.shards.isEmpty && prep.deferred.isEmpty)
            Array.empty[Int]
          else positives.select(col("fp_part"))
            .distinct().collect().map(_.getInt(0)) // bounded ≤ fpParts
        val withRn = scored.withColumn("__rn", rn)
        // the confirm read's history view: rows this (lineage, batch)
        // wrote before a crash are not history. Plain schema inference
        // SAMPLES one footer; on a MIXED store (adopted pre-lineage
        // files + stamped appends) a legacy sample would hide
        // __lineage — skipping the exclusion then would count own-crash
        // rows as history and wrongly reject a replayed batch — so a
        // lineage-less sample retries with mergeSchema (paid only by
        // legacy-looking stores, never the steady state); a store with
        // genuinely NO stamped file has no own rows to exclude.
        def storeHistory(): DataFrame = {
          val plain = spark.read.parquet(stateDir)
          val st =
            if (plain.columns.contains("__lineage")) plain
            else spark.read.option("mergeSchema", "true").parquet(stateDir)
          if (!st.columns.contains("__lineage")) st
          else st.filter(!(col("__lineage") <=> lit(lineage) &&
            col("__batch_id") === lit(batchId)))
        }
        val probed =
          if (posParts.isEmpty) withRn.withColumn("__seen", lit(false))
          else {
            // cheap cardinality probe BEFORE the exact distinct: the
            // distinct is a shuffle of the batch's candidate column, and
            // a dup-heavy batch that is obviously past the cap (the
            // StreamBench worst case — every batch) must not pay it just
            // to learn it can't push. approx_count_distinct is one
            // narrow partial-agg pass; its ±2% error only mis-routes
            // borderline batches between two EXACT paths.
            val nCandEst = positives
              .agg(approx_count_distinct(col("__fp")).as("n"))
              .head().getLong(0)
            val candRows =
              if (nCandEst > maxFpPushdown) Array.empty[org.apache.spark.sql.Row]
              else positives.select(col("__fp")).distinct()
                .take(maxFpPushdown + 1)
            if (nCandEst <= maxFpPushdown &&
                candRows.length <= maxFpPushdown) {
              // candidate fps pushed as point predicates: partition
              // pruning on fp_part, then parquet row-group/page stats
              // on the sorted __fp — the read is bounded by the
              // candidates' row groups, not the partitions
              val cands = candRows.map(_.getLong(0)).toIndexedSeq
              val seenFps = storeHistory()
                .filter(col("fp_part").isin(posParts.toIndexedSeq: _*))
                .filter(col("__fp").isin(cands: _*))
                .select(col("__fp"))
                // replay-duplicated store rows must not fan out the
                // join back onto the batch; ≤ maxFpPushdown rows
                .distinct()
                .withColumn("__seen", lit(true))
              // the broadcast is bounded by the pushdown cap
              withRn.join(broadcast(seenFps), Seq("__fp"), "left")
            } else {
              // dup-heavy batch past the cap: candidate and seen sets
              // are batch-sized, so NO forced broadcast anywhere — AQE
              // sizes both joins from runtime stats (round-12 advice: a
              // force-broadcast batch-sized set risks OOM where a
              // shuffle join would have absorbed it)
              val candidateFps = positives.select(col("__fp")).distinct()
              val seenFps = storeHistory()
                .filter(col("fp_part").isin(posParts.toIndexedSeq: _*))
                .select(col("__fp"))
                .join(candidateFps, Seq("__fp"), "left_semi")
                .distinct()
                .withColumn("__seen", lit(true))
              withRn.join(seenFps, Seq("__fp"), "left")
            }
          }
        val isDup = coalesce(col("__seen"), lit(false)) || col("__rn") > 1
        // near-dup stage (see [[NearDup]]): bands are computed ONLY for
        // exact-level keepers (anything already condemned keeps its
        // cheaper reason under the precedence — the same dead-work
        // argument as the fp probe's gate filter). The store probe runs
        // the fp store's full geometry: per-part Bloom sidecars over
        // xxhash64(band_key) gate which band rows can collide with
        // history at all (bloom-negative rows are definitively new — a
        // no-keeper or all-negative batch never reads the store), and
        // the positives' candidate band keys are pushed into the
        // band_key-sorted store scan as string point predicates under
        // the cap, so the read is bounded by the candidates' row
        // groups, not the partitions. Within the batch: lower-doc_id
        // keepers that are not themselves store-near-dups. The hit sets
        // are bounded by the batch; no forced broadcasts.
        val (withNear, ndCtx) = (for { nd <- nearDup; st <- ndStore } yield {
          val ndfs = st.ensureReady(spark)
          val keepers = probed.filter(gate && !isDup)
            .select(col("doc_id"), col("text"))
          val rows = nearDupRows(keepers, nd.k, nd.bands, nd.n,
              nd.bandParts)
            .localCheckpoint(false)
          val noIds = rows.select(col("doc_id")).limit(0)
          val ndStatePath = new org.apache.hadoop.fs.Path(nd.stateDir)
          val ndLive: Set[Int] =
            if (!ndfs.exists(ndStatePath)) Set.empty
            else ndfs.listStatus(ndStatePath).toIndexedSeq
              .map(_.getPath.getName)
              .filter(_.startsWith("band_part="))
              .flatMap(_.stripPrefix("band_part=").toIntOption).toSet
          val touchedNd: Seq[Int] =
            if (ndLive.isEmpty) Nil
            else rows.select(col("band_part")).distinct()
              .collect().map(_.getInt(0)) // bounded ≤ bandParts
              .toIndexedSeq.filter(ndLive)
          val ndPrep = BloomShards.prepare(spark, nd.stateDir,
            "band_part", xxhash64(col("band_key")), lineage, touchedNd,
            ndBloomCache, ndSliceCap0, fpp, maxBloomLoadBytes)
          val ndGate = BloomShards.gate(xxhash64(col("band_key")),
            col("band_part"), ndPrep, nd.bandParts)
          val ndPositives = rows.filter(ndGate)
          val ndPosParts =
            if (ndPrep.shards.isEmpty && ndPrep.deferred.isEmpty)
              Array.empty[Int]
            else ndPositives.select(col("band_part"))
              .distinct().collect().map(_.getInt(0)) // bounded ≤ bandParts
          val storeHits =
            if (ndPosParts.isEmpty) noIds
            else {
              def ndHistory() = st
                .prunedRead(spark, ndPosParts.toIndexedSeq)
                .filter(!(col("__lineage") <=> lit(lineage) &&
                  col("__batch_id") === lit(batchId)))
              // same cheap cardinality probe as the fp confirm: never
              // pay the distinct shuffle just to learn the batch is
              // past the cap (both routes are exact)
              val nKeyEst = ndPositives
                .agg(approx_count_distinct(col("band_key")).as("n"))
                .head().getLong(0)
              val candRows =
                if (nKeyEst > nd.maxKeyPushdown)
                  Array.empty[org.apache.spark.sql.Row]
                else ndPositives.select(col("band_key"))
                  .distinct().take(nd.maxKeyPushdown + 1)
              val history =
                if (nKeyEst <= nd.maxKeyPushdown &&
                    candRows.length <= nd.maxKeyPushdown)
                  // candidate band keys pushed as point predicates:
                  // partition pruning on band_part, then row-group
                  // stats on the sorted band_key bound the read by the
                  // candidates, not the partitions
                  ndHistory().filter(col("band_key").isin(
                    candRows.map(_.getString(0)).toIndexedSeq: _*))
                else ndHistory() // dup-heavy: AQE sizes the plain join
              ndPositives.alias("nn").join(history.alias("pp"),
                  col("nn.band_id") === col("pp.band_id") &&
                    col("nn.band_key") === col("pp.band_key"))
                .filter(nd.minEst.fold(lit(true))(t =>
                  graft.operators.Dedup.sigAgreement(nd.k, "nn.sig", "pp.sig") >= lit(t)))
                .select(col("nn.doc_id")).distinct()
            }
          val batchHits = rows.alias("aa").join(rows.alias("bb"),
              col("aa.band_id") === col("bb.band_id") &&
                col("aa.band_key") === col("bb.band_key") &&
                col("bb.doc_id") < col("aa.doc_id"))
            .filter(nd.minEst.fold(lit(true))(t =>
              graft.operators.Dedup.sigAgreement(nd.k, "aa.sig", "bb.sig") >= lit(t)))
            // one-level chain resolution (see [[NearDup]]): the kept
            // lower side must not itself be a store-near-dup
            .join(storeHits.withColumnRenamed("doc_id", "__bdoc"),
              col("bb.doc_id") === col("__bdoc"), "left_anti")
            .select(col("aa.doc_id")).distinct()
          val nearIds = storeHits.unionByName(batchHits).distinct()
            .withColumn("__near", lit(true))
          (probed.join(nearIds, Seq("doc_id"), "left"),
            Some((rows, ndPrep.deferred.toSet)))
        }).getOrElse((probed.withColumn("__near", lit(false)), None))
        val isNear = coalesce(col("__near"), lit(false))
        // honest reason for same-batch fp-twins of a NEAR-DUP winner
        // (the quota-twin rule's sibling): the winner's fingerprint
        // never entered the corpus, so exact_dup would be a lie — but
        // identical fp means identical normalized text, which near-dups
        // whatever the winner near-dupped, so the follower's honest
        // reason is near_dup (and unlike the quota case, the follower
        // could never have been admitted). Same window partitioning as
        // __rn/__winner_quota — the planner reuses the exchange.
        val withWinnerNear =
          if (nearDup.isEmpty)
            withNear.withColumn("__winner_near", lit(false))
          else withNear.withColumn("__winner_near",
            max(when(col("__rn") === 1, isNear).otherwise(lit(false)))
              .over(Window.partitionBy(col("__fp"), gate)))
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
          val survivor = quality && col("__overlap") === 0 && !isDup &&
            !isNear
          val rq = row_number().over(
            Window.partitionBy(col(v.groupCol).cast("string"), survivor)
              .orderBy(col("doc_id")))
          withWinnerNear.join(broadcast(prior),
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
        }).getOrElse(withWinnerNear.withColumn("__over_quota", lit(false))
          .withColumn("__winner_quota", lit(false)))
        val judged = withQuota
          .withColumn("reason",
            when(!quality, "quality")
              .when(col("__overlap") > 0, "contaminated")
              .when(coalesce(col("__seen"), lit(false)), "exact_dup")
              .when(col("__rn") > 1 && col("__winner_quota"), "quota")
              .when(col("__rn") > 1 && col("__winner_near"), "near_dup")
              .when(col("__rn") > 1, "exact_dup")
              .when(isNear, "near_dup")
              .when(col("__over_quota"), "quota"))
          .localCheckpoint(false)
        val accepted = judged.filter(col("reason").isNull)
        // RETIRED-ID REUSE fail-fast (r17 verdict #1), BEFORE any ledger
        // write: the retired-ids ledger skips already-applied doc_ids
        // forever, so accepting a NEW doc under a retired id would make
        // that id's later retirement a silent no-op — the new doc's fp
        // would stay in the store after its erasure, the inverse of the
        // temporal un-guarding path the ledger exists to close. Erasure
        // paths don't get silent no-ops, so the collision is refused
        // LOUDLY here, where the id is about to re-enter the corpus.
        // Cost: one fs.exists per batch; the semi-join (ids-only
        // single-file sidecar vs the batch's accepted ids) only when
        // retirements exist at all.
        if (fs.exists(new org.apache.hadoop.fs.Path(
            retiredFile(stateDir)))) {
          val clash = retiredIds(spark, stateDir).map(r =>
            accepted.select(col("doc_id"))
              .join(r, Seq("doc_id"), "left_semi").limit(1).collect())
            .getOrElse(Array.empty[org.apache.spark.sql.Row])
          if (clash.nonEmpty) throw new IllegalStateException(
            s"batch $batchId accepts doc_id ${clash.head.getLong(0)}, " +
              "which is in the retired-ids ledger " +
              s"(${retiredFile(stateDir)}): doc_ids must never be " +
              "reused after retirement — a later retireDocs of this id " +
              "would silently no-op and leave the new doc's fingerprint " +
              "un-erasable. Re-emit the document under a fresh id; if " +
              "this batch is a crash REPLAY of ingestion that predates " +
              "the retirement, unretireDocs(id) — or UNRETIRE DOCS (id) " +
              "FROM GUARD <name> over REST — to let the replay land, " +
              "then re-run the retirement once the batch commits.")
        }
        judged.filter(col("reason").isNotNull)
          .select(col("doc_id"), col("reason"))
          .withColumn("__batch_id", lit(batchId))
          .write.mode(SaveMode.Append).parquet(rejectsDir)
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
          accepted.select(col("__fp"), col("fp_part")).distinct()
            .withColumn("__lineage", lit(lineage)),
          lineage, batchId, Seq("__fp"), repair = false)
        // fold the batch's accepted fps into the cached per-partition
        // Bloom shards and append one batch-proportional delta row per
        // touched part (fresh slices get their first base row; this
        // batch's rebuilds persist theirs). A batch can accept NOTHING
        // (every doc rejected) — then there is nothing to add and the
        // sidecar stays as-is. A replayed batch re-folds its own fps:
        // bits are idempotent, n_items over-counts — which can only
        // trigger an EARLY rebuild that resets the count from the store.
        BloomShards.update(spark, stateDir, "fp_part",
          accepted.select(col("fp_part"), col("__fp")),
          fpBloomCache, sliceCap0, fpp, lineage, batchId,
          deferred = prep.deferred.toSet)
        // grow the near-dup band store with the ACCEPTED docs' bands —
        // after the lookup (a doc never near-dups itself), guarded
        // appends in exact-repair mode (this store IS read whenever any
        // keeper exists, so a restart's repair read is already paid
        // for) — then fold the same bands' key hashes into ITS Bloom
        // sidecars (after the store append, so delta rows never cover
        // hashes the store lacks)
        for { (rows, ndDeferred) <- ndCtx; st <- ndStore; nd <- nearDup } {
          // checkpointed once: the store append and the sidecar update
          // both consume it — without this the keeper⋉accepted semi-join
          // runs twice per batch
          val acceptedBands = rows.join(
              accepted.select(col("doc_id")), Seq("doc_id"), "left_semi")
            .localCheckpoint(false)
          st.appendBatchOnce(spark,
            acceptedBands.withColumn("__lineage", lit(lineage)),
            lineage, batchId, Seq("doc_id", "band_id"))
          BloomShards.update(spark, nd.stateDir, "band_part",
            acceptedBands.select(col("band_part"),
              xxhash64(col("band_key"))),
            ndBloomCache, ndSliceCap0, fpp, lineage, batchId,
            deferred = ndDeferred)
          org.apache.spark.sql.GraftColumnBridge
            .checkpointRdd(acceptedBands).foreach(_.unpersist(false))
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
        (Seq(scored, judged) ++ ndCtx.map(_._1)).foreach(df =>
          org.apache.spark.sql.GraftColumnBridge.checkpointRdd(df)
            .foreach(_.unpersist(false)))
        ()
      }
      .start()
  }

  /** MAINTENANCE compaction of the fingerprint store: rewrite each
    * `fp_part` partition to one file, globally sorted on `__fp` — the
    * store can never retention-prune (dedup is against everything ever
    * accepted), so its per-batch appends accumulate one file per
    * touched partition per batch FOREVER, and a candidate probe pays
    * one row group per FILE instead of one per candidate; compaction
    * collapses that back and bounds the partitions' file counts.
    * Crash-safe two-rename swap ([[Streams.rewriteStore]]), columns
    * (incl. the `__lineage`/`__batch_id` stamps) preserved via merged
    * schema, Bloom sidecars untouched (contents are unchanged).
    *
    * Cost is O(store) per call — run it OUT OF BAND during a low-traffic
    * window amortized over many batches (the lakehouse equivalent of a
    * RocksDB major compaction; a MERGE-capable table format would make
    * it a metadata operation). SINGLE-WRITER: the store's streaming
    * query must be stopped while this runs — the guard's foreachBatch
    * owns the store while active. */
  def compactFpStore(spark: org.apache.spark.sql.SparkSession,
                     stateDir: String): Unit =
    Streams.rewriteStore(spark, stateDir, Seq("fp_part"), Seq("__fp"))(
      identity)

  /** [[compactFpStore]]'s twin for the near-dup BAND store: rewrite each
    * `band_part` partition to one file globally sorted on `band_key`,
    * restoring the one-row-group-per-candidate layout the probe's pushed
    * band-key predicates depend on (per-batch appends are each sorted,
    * but a candidate pays one row group PER FILE until compaction
    * collapses them). Same contract as the fp twin: crash-safe two-rename
    * swap, merged schema, Bloom sidecars untouched, SINGLE-WRITER — stop
    * the guard's streaming query first. */
  def compactNdStore(spark: org.apache.spark.sql.SparkSession,
                     stateDir: String): Unit =
    Streams.rewriteStore(spark, stateDir, Seq("band_part"),
      Seq("band_key"))(identity)

  /** The guard's normalized-text fingerprint of the `text` column — ONE
    * definition shared by the ingest path and [[retireDocs]] (a second
    * derivation could silently drift and retire the wrong hash);
    * package-visible so the retirement spec can assert the stale-bit
    * sidecar condition on the actual hash. */
  private[graft] def fpExpr: org.apache.spark.sql.Column =
    expr(Hashing.hash64("regexp_replace(trim(lower(text)), '\\\\s+', ' ')"))

  /** The retired-ids ledger's path beside the fp store. */
  private[graft] def retiredFile(stateDir: String): String =
    stateDir + ".__retired"

  /** The guard's applied-retirement ledger (one `doc_id` column), or
    * None when nothing was ever retired — the set [[retireDocs]] skips
    * and the ingest path refuses to re-accept (see the fail-fast in
    * [[start]]). Ids-only and single-file, like the index's tombstone
    * sidecar. */
  def retiredIds(spark: org.apache.spark.sql.SparkSession,
                 stateDir: String): Option[DataFrame] =
    Streams.readIdSidecar(spark, retiredFile(stateDir), "doc_id")

  /** ESCAPE HATCH for the ingest fail-fast: drop `docIds` from the
    * retired-ids ledger so a crash-REPLAYED batch whose doc was retired
    * mid-flight (retirement ran between the batch's ledger writes and
    * its checkpoint commit) can land. The replay re-admits the doc —
    * its fingerprint re-enters the store — so RE-RUN the retirement
    * once the batch commits, or the erasure is undone. Never unretire
    * an id that a NEW document reused: that is exactly the silent-no-op
    * hazard the fail-fast exists to refuse. SINGLE-WRITER like every
    * maintenance op (stop the guard first; its batch just failed, so it
    * already is). Returns the number of ids actually removed from the
    * ledger — a replayed unretirement (or an id never retired) resolves
    * to 0, so the statement form is idempotent and its response says
    * whether this run did the work. */
  def unretireDocs(spark: org.apache.spark.sql.SparkSession,
                   stateDir: String, docIds: DataFrame): Long =
    retiredIds(spark, stateDir).fold(0L) { r =>
      val ids = docIds.select(col("doc_id")).distinct()
      val n = r.join(ids, Seq("doc_id"), "left_semi").count()
      if (n > 0)
        Streams.replaceIdSidecar(spark, retiredFile(stateDir),
          r.join(ids, Seq("doc_id"), "left_anti"))
      n
    }

  /** ERASURE maintenance op — make the guard FORGET erased docs (the
    * fp-store twin of [[IvfIndexStream.deleteIds]], with the OPPOSITE
    * retirement semantics, deliberately: an index masks an erased id
    * forever because the id is row identity; the guard's fingerprint is
    * corpus MEMBERSHIP, and once the doc leaves the corpus a future
    * identical page is no longer a duplicate OF anything — it must be
    * judged on its own merits and ACCEPTED, exactly like a duplicate of
    * a rejected page always was, "because dedup is against the CORPUS,
    * not the reject pile").
    *
    * `docIds` names the erased docs; their text — and therefore the
    * fingerprints to drop — is resolved FROM THE ACCEPTED LEDGER
    * (`acceptedDir`), never from caller-supplied text: retiring by raw
    * text would let an operator pass a REJECTED duplicate's copy and
    * silently drop the fp of its still-live accepted twin (the twin
    * shares the fp — that is why it was rejected), un-guarding a doc
    * that never left the corpus. Resolving through the ledger makes
    * the fp ↔ accepted-doc 1:1 claim structural: an id that was never
    * accepted resolves to nothing and retires nothing. The fp store
    * drops the resolved fingerprints, and the near-dup band store
    * (when `ndStateDir` is given — pass it whenever the guard runs
    * with near-dedup, or future NEAR twins of the erased doc stay
    * convicted) drops their band rows by `doc_id`. Both are crash-safe
    * [[Streams.rewriteStore]] swaps preserving the stores' partition +
    * sort layout — the same O(store) offline shape as
    * [[compactFpStore]]/[[compactNdStore]], so batch retirements
    * together at compaction cadence.
    *
    * A RETIRED-IDS LEDGER (`<stateDir>.__retired`, the single-file
    * atomic sidecar) records which ids' retirement has been APPLIED,
    * and already-recorded ids are skipped. This is what makes a replay
    * safe ACROSS TIME, not just immediately: the accepted ledger holds
    * the retired doc's (id, text) forever, and once the same text is
    * legitimately RE-ADMITTED under a new id (the whole point of
    * retirement), a replayed `retireDocs` of the old id would resolve
    * to the shared text and drop the re-admitted doc's LIVE
    * fingerprint — un-guarding it silently. The ledger is written
    * AFTER the store rewrites, so a retirement that crashes mid-way
    * re-applies on re-run (the safe direction — writing it first
    * would let a crash skip the rewrites forever, silently dropping
    * the erasure); complete a torn retirement (re-run it) BEFORE
    * restarting the guard, per the single-writer discipline. The
    * skip-forever ledger makes ID REUSE a hazard in the other
    * direction — a NEW doc accepted under a retired id could never be
    * retired again — so the ingest path FAILS FAST when a batch would
    * accept a retired id (see [[start]]): doc_ids are never reused,
    * by contract, and [[unretireDocs]] is the explicit hatch for the
    * one legitimate exception (a crash-replayed batch whose doc was
    * retired mid-flight).
    *
    * The Bloom sidecars are deliberately UNTOUCHED: a filter cannot
    * unlearn a member, but stale bits are the sidecar's normal
    * false-positive condition — the probe's store confirm read decides
    * (exactly; a false negative is impossible), so a retired fp costs
    * one pruned confirm read per future twin until the part's next
    * natural rebuild, never a wrong decision. The `n_items` overcount
    * only hastens a saturation rebuild, which reads the store and
    * self-heals the filter.
    *
    * NOT touched, by contract: the `accepted`/`rejects` LEDGERS (they
    * are history — what the guard decided when the doc was live; the
    * caller erases the doc from its own corpus store), and the
    * additive analytics views + quota admission counts (also history:
    * retirement changes future DECISIONS, not recorded ones — a
    * quota slot consumed by a later-erased doc is not refunded).
    * SINGLE-WRITER: stop the guard's streaming query first, like every
    * maintenance op here. */
  def retireDocs(spark: org.apache.spark.sql.SparkSession,
                 docIds: DataFrame, acceptedDir: String,
                 stateDir: String,
                 ndStateDir: Option[String] = None): Long = {
    val retiredPath = retiredFile(stateDir)
    val ids = docIds.select(col("doc_id")).distinct()
    val already = Streams.readIdSidecar(spark, retiredPath, "doc_id")
    // only ids not yet applied: a replayed retirement after the same
    // text was re-admitted under a NEW id must not resolve the OLD
    // id's text again (see the ledger note in the scaladoc)
    val fresh = already.fold(ids)(a =>
      ids.join(a, Seq("doc_id"), "left_anti"))
    val docs = accepted(spark, acceptedDir)
      .join(fresh, Seq("doc_id"), "left_semi")
      .localCheckpoint(false)
    val fps = docs.select(fpExpr.as("__fp")).distinct()
    Streams.rewriteStore(spark, stateDir, Seq("fp_part"), Seq("__fp"))(
      _.join(fps, Seq("__fp"), "left_anti"))
    ndStateDir.foreach { nd =>
      Streams.rewriteStore(spark, nd, Seq("band_part"), Seq("band_key"))(
        _.join(docs.select(col("doc_id")), Seq("doc_id"), "left_anti"))
    }
    // record AFTER the rewrites: a mid-retirement crash re-applies on
    // re-run (recording first would let it skip forever). Only ids
    // that actually RESOLVED are recorded — a never-accepted id stays
    // retireable in case its acceptance had simply not landed yet.
    val applied = docs.select(col("doc_id")).distinct()
    val nApplied = applied.count()
    if (nApplied > 0)
      Streams.replaceIdSidecar(spark, retiredPath,
        already.fold(applied)(_.unionByName(applied)).distinct())
    org.apache.spark.sql.GraftColumnBridge
      .checkpointRdd(docs).foreach(_.unpersist(false))
    nApplied
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
