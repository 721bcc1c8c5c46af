package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.{IngestGuard, IvfIndexStream}

/** Scale certification of the FULL CURATION TOPOLOGY composed in one
  * process (r16 verdict Next #5): the ingest guard's ACCEPTED ledger
  * feeding the streaming IVF index as a second chained persistent
  * query — accept → embed → index — exactly the reference's EP2 shape
  * (chained CSAS queries, `ksqldb-statements.sql:13-93`) applied to
  * the LLM-curation brief. Every component is certified alone (guard
  * at 10×/100×, index at 100×); what THIS cert exercises is the seam:
  * two SideStore families and two checkpoints advancing in one
  * process, including a forced crash in the window where the guard
  * has committed a batch but the index has not seen it.
  *
  * Expected-answer-first protocol ([[GuardNearDupCert]]'s, extended):
  *
  *  1. `expected` reuses [[GuardNearDupCert.oracle]] (ONE oracle per
  *     semantics) for the guard half and batch operators for the index
  *     half — the oracle-accepted ids carry deterministic synthetic
  *     embeddings (a pure hash of `doc_id`: the multimodal-stub
  *     discipline — the embedding MODEL is outside this container, the
  *     Spark-side plumbing is the real thing under test), centroids
  *     train by the stream's own birth rule (first-`nlist`-by-vec_id
  *     seed + Lloyd's over the birth set = the oracle's
  *     accepted-slice-0), and [[Similarity.annIvfWith]] over the full
  *     accepted corpus prints the expected result hash, row count, and
  *     a centroid digest BEFORE any stream runs.
  *  2. `run` drives BOTH streams concurrently (slice → guard →
  *     accepted files → index, one guard microbatch per slice, the
  *     index draining after each), then gates on: SET equality of all
  *     four guard ledgers vs the oracle; the index holding EXACTLY the
  *     oracle-accepted ids, each exactly once; and the maintained
  *     store's [[IvfIndexStream.queryMany]] reproducing
  *     [[Similarity.annIvfWith]] over the oracle-accepted embeddings
  *     and the PERSISTED centroids hash-exactly. The expected-mode
  *     hash/digest are re-reported as `expected_hash_match` /
  *     `expected_cents_match` — a false there with `hash_match:true`
  *     is the benign float-sum layout divergence the reindex cert
  *     documents (the oracle trains over its own frame, the stream
  *     over the guard's written files), not a wrong pipeline.
  *  3. `crash` is `run` with a forced mid-pipeline death at the first
  *     post-birth slice: the index query dies FIRST (its continuous
  *     trigger would otherwise drain new accepted files the moment
  *     they land — there is no way to catch a live index behind), the
  *     guard then commits the slice and dies too — process death with
  *     the guard a full commit ahead of the index's checkpoint. Both
  *     restart under their same checkpoints and every `run` gate must
  *     still hold — the index's append guard and the file source's own
  *     tracking make the catch-up exactly-once. The JSON carries the
  *     seam evidence (`accepted_at_crash` > `indexed_at_crash`). The
  *     crash lands at slice 1 because a LATER slice can accept nothing
  *     once the per-source quota saturates, closing the window the
  *     mode exists to open.
  *
  * Honesty note (documented, not hidden): the certified crash window
  * is INDEX-side. A guard-side crash between its accepted append and
  * its checkpoint commit replays the batch and re-appends its accepted
  * files, which the downstream index ingests as duplicate `vec_id`s —
  * the documented data-property contract ([[IvfIndexStream.start]]),
  * observable in the `<prefix>_identity` view and erasable with
  * [[IvfIndexStream.deleteIds]] + [[IvfIndexStream.compactIndex]];
  * [[IngestGuard.accepted]]'s own reader dedups on read for batch
  * consumers.
  *
  * Usage: `runMain graft.tools.GuardIvfPipelineCert <docsDir>
  * [expected|run|crash] [quotaCap=0|N] [minEst=0|x]`. Prints one
  * `GUARDIVF_EXPECTED {...}` or `GUARDIVF {...}` JSON line. */
object GuardIvfPipelineCert {

  private val GroupCol = "source"
  private val Dim = 64
  private val NList = 16
  private val K = 10
  private val NQueries = 100
  private val NProbe = 2

  /** Deterministic embedding of a `doc_id` column — a pure per-row
    * hash expression (codegen'd, layout-independent), shared verbatim
    * by the streaming pipeline and the batch oracle so the two sides
    * can only differ through the pipeline, never the fixture. */
  private def withEmbedding(ids: DataFrame): DataFrame =
    ids.select(col("doc_id").cast("long").as("vec_id"),
      transform(sequence(lit(0), lit(Dim - 1)), i =>
        ((pmod(xxhash64(col("doc_id"), i), lit(2001)) - lit(1000))
          .cast("double") / 500.0).cast("float")).as("embedding"))

  /** The stream's own birth rule over the oracle's accepted-slice-0
    * ids: seed = first `NList` embeddings in vec_id order, Lloyd's at
    * the birth default (trainIters=5) — [[IvfIndexStream.start]]
    * re-derived with batch operators. */
  private def oracleCents(acceptedSlice0: DataFrame): Array[Array[Double]] = {
    val birth = withEmbedding(acceptedSlice0)
    val seed = birth.orderBy(col("vec_id")).limit(NList)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(seed.length >= NList,
      s"fixture too small: slice 0 accepted only ${seed.length} docs " +
        s"< nlist=$NList — the index would not birth on slice 0")
    Similarity.trainCentroidsFrom(birth, seed, 5)
  }

  /** Query ids = the `NQueries` smallest oracle-accepted ids, plus the
    * exclusive threshold that makes [[Similarity.annIvfWith]] (whose
    * queries are `vec_id < nQueries` FROM the corpus) pick exactly
    * them. */
  private def queryIds(accepted: DataFrame): (Seq[Long], Long) = {
    val ids = accepted.select(col("doc_id").cast("long"))
      .orderBy(col("doc_id")).limit(NQueries)
      .collect().map(_.getLong(0)).toIndexedSeq
    (ids, ids.last + 1)
  }

  private def annOracle(accepted: DataFrame,
                        cents: Array[Array[Double]]): (Long, String) = {
    val (_, threshold) = queryIds(accepted)
    CertHash.resultHash(Similarity.annIvfWith(withEmbedding(accepted), cents,
      K, threshold.toInt, NProbe))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: GuardIvfPipelineCert <docsDir> [expected|run|crash] " +
        "[quotaCap] [minEst]")
    val docsDir = args(0)
    val mode = if (args.length > 1) args(1) else "run"
    require(Seq("expected", "run", "crash").contains(mode),
      s"unknown mode '$mode'")
    val quotaCap = Option(args).filter(_.length > 2)
      .map(_(2).toLong).filter(_ > 0)
    val minEst = Option(args).filter(_.length > 3)
      .map(_(3).toDouble).filter(_ > 0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-guardivf")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dirPath = new org.apache.hadoop.fs.Path(docsDir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val slices = fs.listStatus(dirPath).toIndexedSeq
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") &&
        !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .sortBy(_.getName)
      .map(_.toString)
    require(slices.nonEmpty, s"no parquet slices under $docsDir")
    val nDocs = spark.read.parquet(docsDir).count()
    val base = java.nio.file.Files
      .createTempDirectory("graft-guardivf").toString
    val cfg = s""""quota_cap":${quotaCap.getOrElse(0L)},""" +
      s""""min_est":${minEst.getOrElse(0.0)},"nlist":$NList,"dim":$Dim,""" +
      s""""k":$K,"queries":$NQueries,"nprobe":$NProbe"""

    if (mode == "expected") {
      val (acc, ex, near, quo) = GuardNearDupCert.oracle(
        spark, slices, base, quotaCap, minEst)
      val (acc0, _, _, _) = GuardNearDupCert.oracle(
        spark, slices.take(1), s"$base/s0", quotaCap, minEst)
      val cents = oracleCents(acc0)
      val (n, hash) = annOracle(acc, cents)
      println(s"""GUARDIVF_EXPECTED {"docs":$nDocs,"slices":${slices.length},"accepted":${acc.count()},"exact_dup":${ex.count()},"near_dup":${near.count()},"quota":${quo.count()},"index_rows":${acc.count()},"ann_rows":$n,"ann_hash":"$hash","cents":"${CertHash.centsDigest(cents)}",$cfg,"cpus":$cpus}""")
      spark.stop()
      return
    }

    // ---- the composed run: two chained streams, one process ----
    val inDir = java.nio.file.Paths.get(s"$base/in")
    java.nio.file.Files.createDirectories(inDir)
    val acceptedDir = s"$base/accepted"
    // the index's file stream needs the accepted dir to exist at start
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(acceptedDir))
    val docSchema = spark.read.parquet(slices.head)
      .select(col("doc_id"), col("text"), col(GroupCol)).schema
    val acceptedSchema = org.apache.spark.sql.types.StructType(
      docSchema.fields :+ org.apache.spark.sql.types.StructField(
        "__batch_id", org.apache.spark.sql.types.LongType))
    def startGuard() = IngestGuard.start(
      spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
        .select(col("doc_id"), col("text"), col(GroupCol)),
      Array.empty[Long], s"$base/state", acceptedDir, s"$base/rejects",
      s"$base/ckpt_guard", minTokens = 1, maxPunctRatio = 1.0,
      views = quotaCap.map(cap => IngestGuard.Views(s"$base/views",
        groupCol = GroupCol, maxPerGroup = Some(cap))),
      nearDup = Some(IngestGuard.NearDup(s"$base/bands",
        minEst = minEst)))
    // chained query #2: accepted ledger -> synthetic embed -> index
    // (no maxFilesPerTrigger: each drain folds every new accepted file
    // into one microbatch, so the birth batch is slice 0's whole
    // accepted set — the same union the oracle trains on)
    def startIndex() = IvfIndexStream.start(
      withEmbedding(spark.readStream.schema(acceptedSchema)
        .parquet(acceptedDir)),
      s"$base/index", s"$base/ckpt_index", nlist = NList, dim = Dim)
    // crash at the FIRST post-birth slice: the index birthed on slice
    // 0, and slice 1's acceptances are still growing (a later slice
    // can accept nothing once the per-source quota saturates, which
    // would close the guard-ahead window this mode exists to open)
    val crashAt = if (mode == "crash") 1 else -1
    var guard = startGuard()
    var index = startIndex()
    var acceptedAtCrash = -1L
    var indexedAtCrash = -1L
    val t0 = System.nanoTime()
    try {
      slices.zipWithIndex.foreach { case (slice, i) =>
        // the seam, opened deterministically: the index dies FIRST
        // (its continuous trigger would otherwise drain the guard's
        // output the moment it lands), then the guard commits slice i
        // and dies too — process death with the guard a full commit
        // ahead of the index's checkpoint, the exact window no
        // per-component cert covers
        if (i == crashAt) index.stop()
        org.apache.hadoop.fs.FileUtil.copy(fs,
          new org.apache.hadoop.fs.Path(slice), fs,
          new org.apache.hadoop.fs.Path(inDir.toString,
            f"slice_$i%05d.parquet"),
          false, spark.sparkContext.hadoopConfiguration)
        guard.processAllAvailable()
        guard.exception.foreach(throw _)
        if (i == crashAt) {
          acceptedAtCrash = spark.read.parquet(acceptedDir)
            .select(col("doc_id")).distinct().count()
          indexedAtCrash =
            if (fs.exists(new org.apache.hadoop.fs.Path(s"$base/index")))
              spark.read.parquet(s"$base/index").count()
            else 0L
          require(acceptedAtCrash > indexedAtCrash,
            s"crash fixture failed to open the guard-ahead window: " +
              s"accepted=$acceptedAtCrash indexed=$indexedAtCrash " +
              s"at slice $i")
          guard.stop()
          guard = startGuard(); index = startIndex()
          guard.processAllAvailable()
          guard.exception.foreach(throw _)
        }
        index.processAllAvailable()
        index.exception.foreach(throw _)
      }
    } finally { guard.stop(); index.stop() }
    val wallSec = (System.nanoTime() - t0) / 1e9

    // ---- oracle + gates ----
    val (oAcc, oEx, oNear, oQuo) = GuardNearDupCert.oracle(
      spark, slices, base, quotaCap, minEst)
    val (oAcc0, _, _, _) = GuardNearDupCert.oracle(
      spark, slices.take(1), s"$base/s0", quotaCap, minEst)
    val gAcc = IngestGuard.accepted(spark, acceptedDir).select(col("doc_id"))
    val rej = IngestGuard.rejects(spark, s"$base/rejects")
    def setEq(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    val accMatch = setEq(gAcc, oAcc)
    val exMatch = setEq(
      rej.filter(col("reason") === "exact_dup").select(col("doc_id")), oEx)
    val nearMatch = setEq(
      rej.filter(col("reason") === "near_dup").select(col("doc_id")), oNear)
    val quoMatch = setEq(
      rej.filter(col("reason") === "quota").select(col("doc_id")), oQuo)
    // index gates: exactly the oracle-accepted ids, exactly once
    val store = spark.read.parquet(s"$base/index")
    val storeRows = store.count()
    val storeDistinct = store.select(col("vec_id")).distinct().count()
    val idsMatch = setEq(
      store.select(col("vec_id").as("doc_id")).distinct(),
      oAcc.select(col("doc_id").cast("long").as("doc_id")))
    val exactlyOnce = storeRows == storeDistinct && idsMatch
    // ANN gate: the maintained store's queries == the batch operator
    // over the oracle-accepted embeddings and the PERSISTED centroids
    val persisted = IvfIndexStream.readCentroids(spark, s"$base/index").get
    val (qids, _) = queryIds(oAcc)
    val qFrame = {
      import spark.implicits._
      withEmbedding(qids.toDF("doc_id"))
        .withColumnRenamed("vec_id", "query_id")
    }
    val (n, hash) = CertHash.resultHash(IvfIndexStream.queryMany(
      spark, s"$base/index", qFrame, K, NProbe))
    val (oN, oHash) = annOracle(oAcc, persisted)
    // informational: parity with the expected mode's oracle-trained
    // centroids (bit-divergence here is the documented float-sum
    // layout caveat, not a pipeline fault)
    val eCents = oracleCents(oAcc0)
    val (_, eHash) = annOracle(oAcc, eCents)
    val crashFields =
      if (mode == "crash")
        s""""crash_at_slice":$crashAt,"accepted_at_crash":$acceptedAtCrash,"indexed_at_crash":$indexedAtCrash,"""
      else ""
    println(s"""GUARDIVF {"mode":"$mode","docs":$nDocs,"slices":${slices.length},"docs_per_sec":${(nDocs / wallSec).round},"wall_sec":${f"$wallSec%.1f"},"accepted":${gAcc.count()},"accepted_match":$accMatch,"exact_match":$exMatch,"near_match":$nearMatch,"quota_match":$quoMatch,"index_rows":$storeRows,"index_distinct":$storeDistinct,"index_ids_match":$idsMatch,"exactly_once":$exactlyOnce,${crashFields}"rows":$n,"hash":"$hash","oracle_rows":$oN,"oracle_hash":"$oHash","hash_match":${hash == oHash && n == oN},"expected_hash_match":${hash == eHash},"expected_cents_match":${CertHash.centsDigest(persisted) == CertHash.centsDigest(eCents)},"cents":"${CertHash.centsDigest(persisted)}",$cfg,"cpus":$cpus}""")
    spark.stop()
  }
}
