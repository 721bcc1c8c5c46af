package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables
import graft.streaming.IvfIndexStream

/** The at-ingest IVF index: a streamed, cell-partitioned vector store
  * whose queries are RESULT-IDENTICAL to the batch ANN operator over
  * the same vectors and centroids — plus the store-family invariants
  * (centroids pinned at creation, geometry fail-fast, pruned query
  * reads, replay-guarded appends). */
class IvfIndexSpec extends GraftSuite {

  private def chunks(base: String, n: Int) = {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    (0 until n).foreach { c =>
      emb.filter(pmod(col("vec_id"), lit(n)) === c)
        .coalesce(1).write.mode("append").parquet(s"$base/in")
    }
    emb
  }

  test("streamed index queries equal the batch ANN operator exactly; " +
      "centroids train once and never move") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-index").toString
    val emb = chunks(base, 3)
    val stateDir = s"$base/state"
    val q = IvfIndexStream.start(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
      stateDir, s"$base/ckpt", nlist = 16, dim = 64)
    try {
      q.processAllAvailable()
      q.exception.foreach(throw _)
      val cents0 = IvfIndexStream.readCentroids(spark, stateDir).get
      // grow the index with a 4th chunk mid-run: centroids must NOT
      // retrain (they are the cell layout's identity)
      emb.withColumn("vec_id", col("vec_id") + 10000)
        .coalesce(1).write.mode("append").parquet(s"$base/in")
      q.processAllAvailable()
      q.exception.foreach(throw _)
      val cents1 = IvfIndexStream.readCentroids(spark, stateDir).get
      assert(cents0.map(_.toSeq).toSeq === cents1.map(_.toSeq).toSeq,
        "a later batch must never move the pinned centroids")
      // the store holds every vector exactly once (replay guard)
      val store = spark.read.parquet(stateDir)
      assert(store.count() === 1000 &&
        store.select("vec_id").distinct().count() === 1000)
      // PARITY: querying the maintained store == the batch operator
      // over the same vectors + centroids, multi-probe included
      val corpus = emb.unionByName(
        emb.withColumn("vec_id", col("vec_id") + 10000))
      val got = IvfIndexStream.queryMany(spark, stateDir,
          emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSet
      val want = Similarity.annIvfWith(corpus, cents1, k = 3,
          nQueries = 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSet
      assert(got === want,
        "store query must equal the batch ANN operator exactly")
      // the query read is partition-pruned to the probed cells: one
      // query at nprobe=1 decodes one cell's slice, not the corpus
      val one = IvfIndexStream.queryMany(spark, stateDir,
        emb.filter(col("vec_id") === 0)
          .select(col("vec_id").as("query_id"), col("embedding")),
        k = 3, nprobe = 1)
      one.collect()
      val decoded = org.apache.spark.sql.GraftColumnBridge
        .scanOutputRows(one)
      assert(decoded > 0 && decoded < 1000,
        s"query decoded $decoded of 1000 store rows — the read is not " +
          "pruned to the probed cell")
      // EP3 composition: the index's occupancy is pull-queryable like
      // every other materialization
      val engine = new graft.api.Engine(spark)
      engine.registerIvfIndex(stateDir)
      val total = engine.pullQuery(
          "SELECT CAST(sum(n_vectors) AS BIGINT) AS n FROM ivf_cells")
        .head().getLong(0)
      assert(total === 1000L, s"ivf_cells must cover the store: $total")
      engine.terminateAll()
    } finally q.stop()
  }

  test("trickle start: pre-nlist batches stage to the buffer and the " +
      "index births on the batch that reaches nlist — no checkpoint " +
      "surgery, nothing lost, nothing duplicated") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-trickle").toString
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val stateDir = s"$base/state"
    def restart() = IvfIndexStream.start(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
      stateDir, s"$base/ckpt", nlist = 16, dim = 64)
    def land(df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("append").parquet(s"$base/in")
    // batch 0: ONE vector — the r15 crash-loop trigger
    land(emb.filter(col("vec_id") === 0))
    val q = restart()
    try {
      q.processAllAvailable()
      q.exception.foreach(throw _)
      assert(IvfIndexStream.readCentroids(spark, stateDir).isEmpty,
        "1 vector < nlist=16 must not birth the index")
      assert(spark.read.parquet(s"$stateDir.__prebirth").count() === 1L,
        "the under-nlist batch must stage to the pre-birth buffer")
      // batch 1: ten more — still short (11 < 16)
      land(emb.filter(col("vec_id") >= 1 && col("vec_id") < 11))
      q.processAllAvailable()
      q.exception.foreach(throw _)
      assert(IvfIndexStream.readCentroids(spark, stateDir).isEmpty)
      assert(spark.read.parquet(s"$stateDir.__prebirth")
        .select("vec_id").distinct().count() === 11L)
      // batch 2: the rest — cumulative 1000 >= 16 births the index on
      // the union, buffered rows included, buffer dropped
      land(emb.filter(col("vec_id") >= 11))
      q.processAllAvailable()
      q.exception.foreach(throw _)
      val cents = IvfIndexStream.readCentroids(spark, stateDir)
      assert(cents.nonEmpty, "reaching nlist must birth the index")
      assert(!new java.io.File(s"$stateDir.__prebirth").exists(),
        "birth must drop the pre-birth buffer")
      val store = spark.read.parquet(stateDir)
      assert(store.count() === 500L &&
        store.select("vec_id").distinct().count() === 500L,
        "every vector exactly once, buffered rows included")
      // parity with the batch operator over the pinned centroids
      val got = IvfIndexStream.queryMany(spark, stateDir,
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSet
      val want = Similarity.annIvfWith(emb, cents.get, k = 3,
          nQueries = 5, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSet
      assert(got === want,
        "trickle-born index must equal the batch ANN operator")
    } finally q.stop()
  }

  test("a crash between the centroid write and the birth append " +
      "repairs on the next batch: buffer folds in, nothing duplicated") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-birthcrash").toString
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val stateDir = s"$base/state"
    // stage 5 vectors pre-birth, then stop (buffer populated, no index)
    emb.filter(col("vec_id") < 5)
      .coalesce(1).write.mode("append").parquet(s"$base/in")
    val q1 = IvfIndexStream.start(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
      stateDir, s"$base/ckpt", nlist = 16, dim = 64)
    try { q1.processAllAvailable(); q1.exception.foreach(throw _) }
    finally q1.stop()
    assert(IvfIndexStream.readCentroids(spark, stateDir).isEmpty &&
      spark.read.parquet(s"$stateDir.__prebirth").count() === 5L)
    // forge the crash state "centroids persisted, birth append never
    // ran": plant a valid centroid sidecar (trained elsewhere at the
    // same geometry) with no celled store row — exactly what a crash
    // right after writeCentroids leaves behind
    val donorDir = s"$base/donor"
    emb.coalesce(1).write.mode("append").parquet(s"$base/donor_in")
    val qd = IvfIndexStream.start(
      spark.readStream.schema(emb.schema).parquet(s"$base/donor_in"),
      donorDir, s"$base/donor_ckpt", nlist = 16, dim = 64)
    try { qd.processAllAvailable(); qd.exception.foreach(throw _) }
    finally qd.stop()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(donorDir + ".__centroids"),
      java.nio.file.Paths.get(stateDir + ".__centroids"))
    val cents = IvfIndexStream.readCentroids(spark, stateDir).get
    // restart from the SAME checkpoint; the next batch must fold the
    // leftover buffer into its own append and drop it
    emb.filter(col("vec_id") >= 5)
      .coalesce(1).write.mode("append").parquet(s"$base/in")
    val q2 = IvfIndexStream.start(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
      stateDir, s"$base/ckpt", nlist = 16, dim = 64)
    try {
      q2.processAllAvailable()
      q2.exception.foreach(throw _)
      val cents2 = IvfIndexStream.readCentroids(spark, stateDir).get
      assert(cents.map(_.toSeq).toSeq === cents2.map(_.toSeq).toSeq,
        "recovery must keep the already-persisted centroids")
      assert(!new java.io.File(s"$stateDir.__prebirth").exists(),
        "recovery must drop the folded buffer")
      val store = spark.read.parquet(stateDir)
      assert(store.count() === 500L &&
        store.select("vec_id").distinct().count() === 500L,
        "buffered rows fold in exactly once")
      val got = IvfIndexStream.queryMany(spark, stateDir,
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 3, nprobe = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSet
      val want = Similarity.annIvfWith(emb, cents2, k = 3,
          nQueries = 5, nprobe = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSet
      assert(got === want,
        "post-recovery queries must equal the batch ANN operator")
    } finally q2.stop()
  }

  test("drift remedy: a drifted ingest degrades occupancy balance, " +
      "reindexInto restores it, post-swap queries are exact, and the " +
      "stream resumes into the new dir under the same checkpoint") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-reindex").toString
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    // distribution B: a cluster around the all-ones direction with
    // noise a quarter of the offset — nothing the birth batch trained
    // on points that way, so post-drift rows pile into the one or two
    // most aligned cells
    val drifted = emb.withColumn("vec_id", col("vec_id") + 10000)
      .withColumn("embedding",
        transform(col("embedding"), x => x * lit(0.25f) + lit(1.0f)))
    val stateDir = s"$base/state"
    def land(df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("append").parquet(s"$base/in")
    def restart(dir: String) = IvfIndexStream.start(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
      dir, s"$base/ckpt", nlist = 16, dim = 64)
    land(emb) // batch 0: births on distribution A only
    val q1 = restart(stateDir)
    try {
      q1.processAllAvailable(); q1.exception.foreach(throw _)
      land(drifted) // batch 1: distribution B arrives after the pin
      q1.processAllAvailable(); q1.exception.foreach(throw _)
    } finally q1.stop()
    def topCellShare(dir: String): Double = {
      val occ = spark.read.parquet(dir).groupBy("cell").count()
        .collect().map(_.getLong(1))
      occ.max.toDouble / occ.sum
    }
    // the drifted half concentrates: the fullest cell holds several
    // times a balanced index's 1/16 share
    val before = topCellShare(stateDir)
    assert(before > 0.3,
      f"drift fixture too tame: top cell holds $before%.2f of the corpus")
    val newDir = s"$base/state_v2"
    val newCents =
      IvfIndexStream.reindexInto(spark, stateDir, newDir, nlist = 16)
    // occupancy balance restored (centroids retrained on the full
    // drifted corpus), visible through the same ivf_cells monitor that
    // detects the drift
    val engine = new graft.api.Engine(spark)
    engine.registerIvfIndex(newDir, prefix = "ivf2")
    val occ2 = engine.pullQuery(
        "SELECT CAST(max(n_vectors) AS BIGINT) AS mx, " +
          "CAST(sum(n_vectors) AS BIGINT) AS n FROM ivf2_cells").head()
    engine.terminateAll()
    val after = occ2.getLong(0).toDouble / occ2.getLong(1)
    assert(occ2.getLong(1) === 1000L,
      s"backfill must carry every stored vector: ${occ2.getLong(1)}")
    // the rebuild trains with cell rebalancing
    // (Similarity.trainCentroidsBalanced): the drifted blob is
    // bisected until no cell holds 4x the emptiest, so the top-cell
    // share drops to a small multiple of the balanced 1/16
    assert(after < before / 2,
      f"reindex must restore balance: top-cell share $before%.2f -> $after%.2f")
    // post-swap queries are exactly the batch operator over the NEW
    // centroids (sanity: the persisted sidecar equals the returned ones)
    assert(IvfIndexStream.readCentroids(spark, newDir).get
      .map(_.toSeq).toSeq === newCents.map(_.toSeq).toSeq)
    val corpus = emb.unionByName(drifted)
    def parity(k: Int, nprobe: Int): Unit = {
      val got = IvfIndexStream.queryMany(spark, newDir,
          corpus.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = k, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSet
      val want = Similarity.annIvfWith(corpus, newCents, k = k,
          nQueries = 10, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSet
      assert(got === want,
        s"post-swap query (k=$k nprobe=$nprobe) must equal the batch " +
          "ANN operator over the new centroids")
    }
    parity(3, 2)
    // the SWAP: the stream restarts at the new dir under the SAME
    // checkpoint and keeps ingesting — nothing lost, nothing duplicated
    land(emb.withColumn("vec_id", col("vec_id") + 20000))
    val q2 = restart(newDir)
    try {
      q2.processAllAvailable(); q2.exception.foreach(throw _)
      val store = spark.read.parquet(newDir)
      assert(store.count() === 1500L &&
        store.select("vec_id").distinct().count() === 1500L,
        "post-swap ingest must append exactly once")
      assert(IvfIndexStream.readCentroids(spark, newDir).get
        .map(_.toSeq).toSeq === newCents.map(_.toSeq).toSeq,
        "post-swap ingest must not move the new centroids")
    } finally q2.stop()
    // reindex refuses a live target and a mid-birth store
    intercept[IllegalArgumentException] {
      IvfIndexStream.reindexInto(spark, stateDir, newDir, nlist = 16)
    }
  }

  test("shard merge + nlist resize: two independently-ingested indexes " +
      "merge into a fresh 32-cell index whose queries are exact, and a " +
      "fresh-checkpoint stream keeps ingesting it exactly once") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-merge").toString
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val shard2In = emb.withColumn("vec_id", col("vec_id") + 10000)
    def ingest(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode("append").parquet(s"$base/in_$name")
      val q = IvfIndexStream.start(
        spark.readStream.schema(emb.schema).parquet(s"$base/in_$name"),
        s"$base/$name", s"$base/ckpt_$name", nlist = 16, dim = 64)
      try { q.processAllAvailable(); q.exception.foreach(throw _) }
      finally q.stop()
    }
    ingest(emb, "s1")
    ingest(shard2In, "s2")
    val merged = s"$base/merged"
    val cents = IvfIndexStream.mergeInto(
      spark, Seq(s"$base/s1", s"$base/s2"), merged, nlist = 32)
    assert(cents.length === 32 &&
      IvfIndexStream.readCentroids(spark, merged).get.length === 32,
      "the merged index adopts the resized cell count")
    val corpus = emb.unionByName(shard2In)
    val store = spark.read.parquet(merged)
    assert(store.count() === 1000L &&
      store.select("vec_id").distinct().count() === 1000L)
    val got = IvfIndexStream.queryMany(spark, merged,
        corpus.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding")),
        k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    val want = Similarity.annIvfWith(corpus, cents, k = 3,
        nQueries = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(got === want,
      "merged-index queries must equal the batch ANN operator over " +
        "the union and the merged centroids")
    // a FRESH checkpoint picks the merged index up: its first batch is
    // the append guard's repair read (absent marker, foreign-lineage
    // backfill) — everything lands exactly once
    emb.withColumn("vec_id", col("vec_id") + 20000)
      .coalesce(1).write.mode("append").parquet(s"$base/in_more")
    val q = IvfIndexStream.start(
      spark.readStream.schema(emb.schema).parquet(s"$base/in_more"),
      merged, s"$base/ckpt_merged", nlist = 32, dim = 64)
    try {
      q.processAllAvailable(); q.exception.foreach(throw _)
      val after = spark.read.parquet(merged)
      assert(after.count() === 1500L &&
        after.select("vec_id").distinct().count() === 1500L,
        "fresh-checkpoint ingest into the merged index must land " +
          "exactly once")
      assert(IvfIndexStream.readCentroids(spark, merged).get
        .map(_.toSeq).toSeq === cents.map(_.toSeq).toSeq,
        "ingest must not move the merged centroids")
    } finally q.stop()
    // maintenance twin: compaction (stream stopped) collapses each
    // cell to one file without changing rows or query results
    def q10(): Set[(Long, Long, Double, Int)] =
      IvfIndexStream.queryMany(spark, merged,
          corpus.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSet
    val preCompact = q10()
    IvfIndexStream.compactIndex(spark, merged)
    val cellDirs = new java.io.File(merged).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.forall(
      _.listFiles().count(f => f.getName.endsWith(".parquet")) == 1),
      "compaction must leave one file per cell")
    val afterCompact = spark.read.parquet(merged)
    assert(afterCompact.count() === 1500L &&
      afterCompact.select("vec_id").distinct().count() === 1500L,
      "compaction must not add or drop rows")
    assert(q10() === preCompact,
      "compaction must not change query results")
    // refusals: overlapping vec_ids conflate rows — fail fast; live
    // target — fail fast
    val dup = s"$base/s1dup"
    ingest(emb, "s1dup")
    intercept[IllegalArgumentException] {
      IvfIndexStream.mergeInto(spark, Seq(s"$base/s1", dup),
        s"$base/merged2", nlist = 16)
    }
    intercept[IllegalArgumentException] {
      IvfIndexStream.mergeInto(spark, Seq(s"$base/s1"), merged,
        nlist = 16)
    }
  }

  private def ingestInto(base: String, stateDir: String, ckpt: String,
                         df: org.apache.spark.sql.DataFrame,
                         inSuffix: String = "in",
                         nlist: Int = 16): Unit = {
    df.coalesce(1).write.mode("append").parquet(s"$base/$inSuffix")
    val q = IvfIndexStream.start(
      spark.readStream.schema(df.schema).parquet(s"$base/$inSuffix"),
      stateDir, ckpt, nlist = nlist, dim = 64)
    try { q.processAllAvailable(); q.exception.foreach(throw _) }
    finally q.stop()
  }

  private def topK(dir: String, queries: org.apache.spark.sql.DataFrame,
                   k: Int = 3, nprobe: Int = 2)
      : Set[(Long, Long, Double, Int)] =
    IvfIndexStream.queryMany(spark, dir, queries, k, nprobe)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet

  private def batchTopK(corpus: org.apache.spark.sql.DataFrame,
                        cents: Array[Array[Double]], nQueries: Int,
                        k: Int = 3, nprobe: Int = 2)
      : Set[(Long, Long, Double, Int)] =
    Similarity.annIvfWith(corpus, cents, k, nQueries, nprobe)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet

  test("deleteIds retires vectors: masked from queries immediately, " +
      "idempotent under replay, physically purged by compaction (which " +
      "keeps the tombstones), and a re-emitted deleted id stays erased") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-delete").toString
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val stateDir = s"$base/state"
    ingestInto(base, stateDir, s"$base/ckpt", emb)
    val cents = IvfIndexStream.readCentroids(spark, stateDir).get
    val queries = emb.filter(col("vec_id") >= 50 && col("vec_id") < 60)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val pre = topK(stateDir, queries)
    assert(pre.exists(_._2 < 50),
      "fixture too tame: no query's top-3 contains a to-be-deleted id — " +
        "deletion would be unobservable; widen the deleted range")
    // delete ids 0..49; a REPLAYED delete must change nothing
    IvfIndexStream.deleteIds(spark, stateDir, (0L until 50L))
    IvfIndexStream.deleteIds(spark, stateDir, (0L until 50L))
    assert(IvfIndexStream.readTombstones(spark, stateDir).get.count()
      === 50L, "a replayed delete must be idempotent")
    val survivors = emb.filter(col("vec_id") >= 50)
    val post = topK(stateDir, queries)
    assert(!post.exists(_._2 < 50),
      "a deleted id must never appear in query results")
    assert(post === batchTopK(survivors, cents, nQueries = 60),
      "post-delete queries must equal the batch operator over the " +
        "SURVIVING rows and the same centroids")
    // a deleted id RE-EMITTED by ingest stays erased (retirement, not a
    // point-in-time hide): land id 0 again under the same checkpoint
    ingestInto(base, stateDir, s"$base/ckpt",
      emb.filter(col("vec_id") === 0))
    assert(spark.read.parquet(stateDir).count() === 501L,
      "the re-emit itself must land (ingest never reads tombstones)")
    assert(!topK(stateDir, queries).exists(_._2 < 50),
      "a re-emitted deleted id must stay masked")
    // identity view: erosion and pending erasure are observable
    val engine = new graft.api.Engine(spark)
    engine.registerIvfIndex(stateDir, prefix = "del")
    val idRow = engine.pullQuery("SELECT n_rows, n_distinct_ids, " +
      "n_duplicate_rows, n_tombstones FROM del_identity").head()
    assert(idRow.getLong(0) === 501L && idRow.getLong(1) === 500L &&
      idRow.getLong(2) === 1L && idRow.getLong(3) === 50L,
      s"identity view must show the dup and the tombstones: $idRow")
    // compaction PHYSICALLY purges: 51 rows gone (ids 0..49 plus the
    // re-emitted 0), one file per cell, tombstones kept, queries stable
    IvfIndexStream.compactIndex(spark, stateDir)
    val store = spark.read.parquet(stateDir)
    assert(store.count() === 450L &&
      store.filter(col("vec_id") < 50).isEmpty,
      "compaction must purge every tombstoned row")
    val cellDirs = new java.io.File(stateDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.forall(
      _.listFiles().count(f => f.getName.endsWith(".parquet")) == 1),
      "compaction must leave one file per cell")
    assert(IvfIndexStream.readTombstones(spark, stateDir).get.count()
      === 50L, "compaction must KEEP the tombstones (ids stay retired)")
    assert(topK(stateDir, queries) === post,
      "compaction must not change query results")
    val idRow2 = engine.pullQuery(
      "SELECT n_rows, n_tombstones FROM del_identity").head()
    assert(idRow2.getLong(0) === 450L && idRow2.getLong(1) === 50L,
      s"identity view must reflect the purge: $idRow2")
    engine.terminateAll()
  }

  test("deletion composes with the maintenance ops: reindexInto drops " +
      "tombstoned rows and carries the tombstones; mergeInto unions " +
      "them across shards") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-delreindex").toString
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val stateDir = s"$base/state"
    ingestInto(base, stateDir, s"$base/ckpt", emb)
    IvfIndexStream.deleteIds(spark, stateDir, (0L until 50L))
    val survivors = emb.filter(col("vec_id") >= 50)
    val queries = emb.filter(col("vec_id") >= 50 && col("vec_id") < 60)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // reindex: the rebuild is also the purge, and retirement travels
    val newDir = s"$base/state_v2"
    val newCents =
      IvfIndexStream.reindexInto(spark, stateDir, newDir, nlist = 16)
    val v2 = spark.read.parquet(newDir)
    assert(v2.count() === 450L && v2.filter(col("vec_id") < 50).isEmpty,
      "reindex must backfill only the surviving rows")
    assert(topK(newDir, queries) ===
      batchTopK(survivors, newCents, nQueries = 60),
      "the reindexed store must reproduce the batch oracle over the " +
        "surviving rows")
    assert(IvfIndexStream.readTombstones(spark, newDir).get.count()
      === 50L, "tombstones must travel through a reindex")
    // post-swap re-emit of an erased id stays erased in the NEW dir
    ingestInto(base, newDir, s"$base/ckpt",
      emb.filter(col("vec_id") === 3))
    assert(!topK(newDir, queries).exists(_._2 < 50),
      "an id erased before the reindex must stay erased after the swap")
    // merge: shard 2 with its own deletions; tombstones UNION
    val shard2 = s"$base/shard2"
    val emb2 = emb.withColumn("vec_id", col("vec_id") + 10000)
    ingestInto(base, shard2, s"$base/ckpt2", emb2, inSuffix = "in2")
    IvfIndexStream.deleteIds(spark, shard2,
      (10000L until 10010L))
    val merged = s"$base/merged"
    val mCents = IvfIndexStream.mergeInto(
      spark, Seq(stateDir, shard2), merged, nlist = 32)
    val mStore = spark.read.parquet(merged)
    // stateDir still holds its 500 physical rows (never compacted) of
    // which 50 are tombstoned -> 450 survive the merge; shard2
    // contributes 490
    assert(mStore.count() === 940L &&
      mStore.filter(col("vec_id") < 50 ||
        (col("vec_id") >= 10000 && col("vec_id") < 10010)).isEmpty,
      s"merge must drop every shard's tombstoned rows: ${mStore.count()}")
    assert(IvfIndexStream.readTombstones(spark, merged).get.count()
      === 60L, "merge must union the shards' tombstones")
    val mCorpus = survivors.unionByName(
      emb2.filter(col("vec_id") >= 10010))
    assert(topK(merged, queries) ===
      batchTopK(mCorpus, mCents, nQueries = 60),
      "merged-store queries must equal the batch oracle over the union " +
        "of survivors")
    // a tombstone shared by EVERY shard (one erasure list applied to
    // all, or shards split from a common ancestor) is AGREEMENT, not a
    // conflict — the merge must succeed and union it once
    IvfIndexStream.deleteIds(spark, stateDir, Seq(77777L))
    IvfIndexStream.deleteIds(spark, shard2, Seq(77777L))
    IvfIndexStream.mergeInto(
      spark, Seq(stateDir, shard2), s"$base/merged2", nlist = 32)
    assert(IvfIndexStream.readTombstones(spark, s"$base/merged2")
      .get.count() === 61L,
      "the shared tombstone must union once beside each shard's own")
    // but an id LIVE in one shard while another shard carries it
    // erased IS a conflict: the carried tombstone would silently mask
    // the live vector — fail fast like two live copies
    IvfIndexStream.deleteIds(spark, shard2, Seq(50L)) // 50 lives in stateDir
    intercept[IllegalArgumentException] {
      IvfIndexStream.mergeInto(
        spark, Seq(stateDir, shard2), s"$base/merged3", nlist = 32)
    }
  }

  test("a stale tombstone sidecar at the reindex target is refused by " +
      "name, and a carryTombstones=false rebuild starts with NO " +
      "retirement set (r17 ADVICE: a torn prior attempt's sidecar must " +
      "not silently survive the reset the operator explicitly chose)") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-staletomb").toString
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val stateDir = s"$base/state"
    ingestInto(base, stateDir, s"$base/ckpt", emb)
    IvfIndexStream.deleteIds(spark, stateDir, (0L until 50L))
    // forge the torn-attempt leftover the ADVICE names: only the
    // tombstone sidecar at the target (the operator followed the old
    // error message and deleted the data dir + markers, not this)
    val newDir = s"$base/state_v2"
    graft.streaming.Streams.replaceIdSidecar(spark,
      s"$newDir.__tombstones", Seq(999L).toDF("vec_id"))
    val refusal = intercept[IllegalArgumentException] {
      IvfIndexStream.reindexInto(spark, stateDir, newDir, nlist = 16)
    }
    assert(refusal.getMessage.contains("__tombstones"),
      s"the refusal must name the sidecar in the remedy: $refusal")
    // following the (now complete) remedy clears it; a reset rebuild
    // then starts with no tombstones — while still PURGING the source's
    // tombstoned rows from the backfill (the reset forgets the ids, not
    // the already-applied erasure)
    val fs = new org.apache.hadoop.fs.Path(newDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$newDir.__tombstones"), false)
    IvfIndexStream.reindexInto(spark, stateDir, newDir, nlist = 16,
      carryTombstones = false)
    assert(IvfIndexStream.readTombstones(spark, newDir).isEmpty,
      "carryTombstones=false must produce a tombstone-free index")
    val v2 = spark.read.parquet(newDir)
    assert(v2.count() === 450L && v2.filter(col("vec_id") < 50).isEmpty,
      "the reset rebuild still purges the source's tombstoned rows")
  }

  test("a re-emitted vec_id is kept as data, occupies two of the k " +
      "ranks, and is visible in the occupancy/identity views — the " +
      "pinned duplicate-id contract") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-dup").toString
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val stateDir = s"$base/state"
    ingestInto(base, stateDir, s"$base/ckpt", emb)
    // batch 1 re-emits id 7 with the same vector (the common replayed-
    // producer shape): post-birth ingest keeps it — a data property
    ingestInto(base, stateDir, s"$base/ckpt",
      emb.filter(col("vec_id") === 7))
    val store = spark.read.parquet(stateDir)
    assert(store.count() === 501L &&
      store.filter(col("vec_id") === 7).count() === 2L)
    // a query AT id 7's vector sees the id at TWO ranks — the
    // effective-k shrink queryMany's scaladoc pins
    val q7 = emb.filter(col("vec_id") === 7)
      .select(lit(-1L).as("query_id"), col("embedding"))
    val got = topK(stateDir, q7, k = 3, nprobe = 2)
    assert(got.filter(_._2 == 7L).map(_._4) === Set(1, 2),
      s"both copies must rank (k shrinks silently): $got")
    // and the dashboard sees the erosion: occupancy stays footer-cheap
    // (row counts only), the identity view carries the audit
    val engine = new graft.api.Engine(spark)
    engine.registerIvfIndex(stateDir, prefix = "dup")
    val cells = engine.pullQuery(
      "SELECT CAST(sum(n_vectors) AS BIGINT) AS n FROM dup_cells").head()
    assert(cells.getLong(0) === 501L,
      s"occupancy must count the duplicate row: $cells")
    val id = engine.pullQuery("SELECT n_rows, n_distinct_ids, " +
      "n_duplicate_rows, n_tombstones FROM dup_identity").head()
    assert(id.getLong(0) === 501L && id.getLong(1) === 500L &&
      id.getLong(2) === 1L && id.getLong(3) === 0L,
      s"identity view must total the erosion: $id")
    engine.terminateAll()
  }

  test("geometry and identity fail fast: nlist mismatch names both " +
      "tags; data without centroids refuses to guess") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivf-guards").toString
    val emb = chunks(base, 2)
    val stateDir = s"$base/state"
    val q1 = IvfIndexStream.start(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
      stateDir, s"$base/ckpt1", nlist = 16, dim = 64)
    try { q1.processAllAvailable(); q1.exception.foreach(throw _) }
    finally q1.stop()
    // a freshly-born index (centroids persisted, no row landed yet) is
    // queryable as EMPTY, not a path error
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(stateDir + ".__centroids"),
      java.nio.file.Paths.get(s"$base/newborn.__centroids"))
    assert(IvfIndexStream.queryMany(spark, s"$base/newborn",
      emb.filter(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"), col("embedding"))).count()
      === 0L, "a rowless index must answer empty")
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    // restart at a different nlist: the format marker must fail fast
    val q2 = IvfIndexStream.start(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
      stateDir, s"$base/ckpt2", nlist = 8, dim = 64)
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(causes(e2).exists(c =>
      c.getMessage != null && c.getMessage.contains("nlist=16") &&
        c.getMessage.contains("nlist=8")), e2.getMessage)
    // delete the centroid sidecar under a store WITH data: the index
    // must refuse to retrain (silently reassigned cells would orphan
    // the stored layout), naming the sidecar
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(stateDir + ".__centroids"))
    val q3 = IvfIndexStream.start(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
      stateDir, s"$base/ckpt3", nlist = 16, dim = 64)
    val e3 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q3.processAllAvailable() finally q3.stop()
    }
    assert(causes(e3).exists(c =>
      c.getMessage != null && c.getMessage.contains("centroid")),
      e3.getMessage)
  }
}
