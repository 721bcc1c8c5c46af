package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.functions.VectorExpressions
import graft.operators.Similarity

/** At-ingest IVF INDEX maintenance — the streaming sibling of the batch
  * ANN stack ([[Similarity.annIvf]]/`annIvfMultiProbe`): arriving
  * embeddings are assigned to their inverted-list cell by the same
  * codegen'd [[VectorExpressions.argMaxDot]] projection and appended to
  * a cell-partitioned store, so similarity QUERIES over everything
  * ingested so far read only the probed cells' partitions — the
  * continuously-maintained vector index a training-data pipeline wants
  * beside the at-ingest dedup stores (reference's EP2 "derive as data
  * arrives" composition, applied to Jégou et al.'s IVF).
  *
  * CENTROIDS ARE THE INDEX'S IDENTITY and are pinned at creation: the
  * first microbatch trains spherical k-means
  * ([[Similarity.trainCentroidsFrom]] — seeded by the batch's first
  * `nlist` vectors in vec_id order, since arbitrary ids defeat the
  * batch operator's `vec_id < nlist` rule) and persists them to a
  * driver-native sidecar BEFORE any row lands; every later batch and
  * every query loads that file. Retraining on restart would silently
  * reassign cells and orphan the stored layout — so a store with data
  * but no readable centroid file FAILS FAST (the file is the only
  * source of cell identity; a torn write can only strand an EMPTY
  * store, which retrains from scratch). The [[Streams.SideStore]]
  * format marker pins `(nlist, dim)` so a mismatched restart fails with
  * both tags, like every other store here.
  *
  * Scale shape:
  *  - ingest: one codegen'd projection per batch + the guarded
  *    clustered append ([[Streams.SideStore.appendBatchOnce]] — replay
  *    appends nothing, a crash mid-append repairs exactly);
  *  - query ([[queryMany]]): probe-cell assignment is the codegen'd
  *    [[VectorExpressions.argTopPDot]] on the query side only; the
  *    store read is partition-pruned to the probed cells (distinct
  *    probe cells are a bounded ≤ `nlist` collect), exact cosine
  *    re-rank inside — per-query cost tracks the probed slices, never
  *    the corpus;
  *  - the store never retention-prunes (an index forgets nothing), the
  *    same corpus-lifetime contract as the guard's fingerprint store;
  *    [[compactIndex]] is the maintenance twin.
  *
  * Queries against the maintained store are EXACTLY
  * [[Similarity.annIvfWith]] over the same vectors and centroids —
  * cell assignment, scoring, and tie-breaks included (IvfIndexSpec
  * pins the equality).
  *
  * Design note (the standard IVF operational contract, not a gap): a
  * drifting ingest distribution degrades cell BALANCE over time, which
  * costs probe selectivity, never correctness. The monitor is the
  * occupancy view ([[graft.api.Engine.registerIvfIndex]] — `ivf_cells`
  * over pull/REST); the remedy is an offline rebuild into a fresh
  * index dir (new centroids, backfilled store) swapped in by the
  * caller — in-place retraining is deliberately impossible because the
  * stored layout would silently orphan. */
object IvfIndexStream {

  private def formatTag(nlist: Int, dim: Int): String =
    s"ivf-index/v1/nlist=$nlist/dim=$dim/metric=cosine"

  private def centroidsPath(stateDir: String) =
    new org.apache.hadoop.fs.Path(stateDir + ".__centroids")

  private val CentroidMagic = 0x47495631 // "GIV1"

  private def writeCentroids(fs: org.apache.hadoop.fs.FileSystem,
                             stateDir: String,
                             cents: Array[Array[Double]]): Unit = {
    val target = centroidsPath(stateDir)
    val tmp = new org.apache.hadoop.fs.Path(
      target.getParent, target.getName + ".tmp")
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(tmp, true)))
    try {
      out.writeInt(CentroidMagic)
      out.writeInt(cents.length)
      out.writeInt(cents.head.length)
      cents.foreach(_.foreach(out.writeDouble))
    } finally out.close()
    // written ONCE at creation, before any store row exists — so this
    // plain rename's failure window can only strand an empty store,
    // which simply retrains
    require(fs.rename(tmp, target),
      s"could not persist IVF centroids for $stateDir")
  }

  /** The index's pinned centroids (None = absent or torn — the caller
    * decides whether that means "fresh, train" or "fail fast"). */
  def readCentroids(spark: SparkSession,
                    stateDir: String): Option[Array[Array[Double]]] = {
    val p = centroidsPath(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(p)))
    try {
      if (in.readInt() != CentroidMagic) return None
      val n = in.readInt()
      val dim = in.readInt()
      Some(Array.fill(n)(Array.fill(dim)(in.readDouble())))
    } catch {
      case _: java.io.IOException => None
    } finally in.close()
  }

  /** Start maintaining the index at `stateDir` from a streaming
    * `(vec_id: long, embedding: array<float>)` frame. `dim` pins the
    * vector width into the format marker (mismatched restarts fail
    * fast); the FIRST batch must carry at least `nlist` vectors (an
    * index cannot be born with fewer lists than centroids). */
  def start(vecs: DataFrame, stateDir: String, checkpoint: String,
            nlist: Int = 16, dim: Int = 64,
            trainIters: Int = 5): StreamingQuery = {
    require(nlist > 0 && dim > 0 && trainIters >= 0,
      "nlist/dim must be positive, trainIters >= 0")
    val store = new Streams.SideStore(stateDir, "cell",
      formatTag(nlist, dim), "IvfIndexStream", 0, 0)
    val lineage = Streams.lineageId(
      vecs.sparkSession.sparkContext.hadoopConfiguration, checkpoint)
    vecs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = store.ensureReady(spark)
        val vecsB = batch.select(col("vec_id"), col("embedding"))
        val existing = readCentroids(spark, stateDir)
        // an empty batch cannot birth an index — wait for data (no
        // `return`: a non-local return from a foreachBatch lambda
        // would fail the batch)
        if (existing.nonEmpty || !vecsB.isEmpty) {
          val cents = existing.getOrElse {
            if (store.exists(fs) &&
                fs.listStatus(new org.apache.hadoop.fs.Path(stateDir))
                  .exists(_.getPath.getName.startsWith("cell=")))
              throw new IllegalStateException(
                s"IvfIndexStream store at $stateDir has data but no " +
                  "readable centroid sidecar — centroids are the cell " +
                  "layout's identity and cannot be re-derived; restore " +
                  s"${centroidsPath(stateDir)} or rebuild the index fresh")
            val seed = vecsB.orderBy(col("vec_id")).limit(nlist)
              .select(col("embedding")).collect()
              .map(_.getSeq[Float](0).map(_.toDouble).toArray)
            require(seed.length >= nlist,
              s"first batch carries ${seed.length} vectors < " +
                s"nlist=$nlist — an index cannot be born with fewer " +
                "vectors than cells")
            require(seed.head.length == dim,
              s"vectors are ${seed.head.length}-dim, index configured " +
                s"for $dim")
            val trained =
              Similarity.trainCentroidsFrom(vecsB, seed, trainIters)
            writeCentroids(fs, stateDir, trained)
            trained
          }
          store.appendBatchOnce(spark,
            vecsB.withColumn("cell",
                VectorExpressions.argMaxDot(col("embedding"), cents))
              .withColumn("__lineage", lit(lineage)),
            lineage, batchId, Seq("vec_id"))
        }
        ()
      }
      .start()
  }

  /** ANN top-k of each `(query_id, embedding)` row against everything
    * ingested so far: probe-cell assignment on the query side
    * (codegen'd top-p), store read PRUNED to the probed cells, exact
    * cosine re-rank, `(query_id, neighbor_id, score, rank)` out —
    * result-identical to [[Similarity.annIvfWith]] over the same
    * vectors/centroids. Self-matches (`neighbor_id == query_id`) are
    * excluded, like the batch twin. */
  def queryMany(spark: SparkSession, stateDir: String,
                queries: DataFrame, k: Int = 3,
                nprobe: Int = 1): DataFrame = {
    val cents = readCentroids(spark, stateDir).getOrElse(
      throw new IllegalStateException(
        s"no IVF index at $stateDir (centroid sidecar absent)"))
    val probed = broadcast(queries
      .select(col("query_id"), col("embedding").as("qv"),
        explode(VectorExpressions.argTopPDot(
          col("embedding"), cents, nprobe)).as("qcell")))
    // centroids land before the first append, so a freshly-born index
    // can be queryable before any row exists — that is an EMPTY result,
    // not a path error. Directory existence alone is not enough: a
    // crashed first append can leave the dir with only uncommitted
    // droppings (e.g. a _temporary subdir, no cell=* parquet), which
    // would throw schema inference at read time — committed CELL data
    // is the real emptiness test (r15 ADVICE low).
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fsQ = statePath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val hasCommitted = fsQ.exists(statePath) &&
      fsQ.listStatus(statePath).exists(cd =>
        cd.isDirectory && cd.getPath.getName.startsWith("cell=") &&
          fsQ.listStatus(cd.getPath).exists(f =>
            f.isFile && f.getPath.getName.endsWith(".parquet")))
    if (!hasCommitted)
      return queries.select(col("query_id"),
        col("query_id").as("neighbor_id"),
        lit(0.0).as("score"), lit(0).as("rank")).limit(0)
    val cells = probed.select(col("qcell")).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq // bounded <= nlist
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    spark.read.parquet(stateDir)
      .filter(col("cell").isin(cells: _*)) // static partition pruning
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"), col("cell"))
      .join(probed,
        col("cell") === col("qcell") && col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        VectorExpressions.cosineSim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rank"))
  }

  /** Single-vector convenience over [[queryMany]]. */
  def query(spark: SparkSession, stateDir: String, qvec: Array[Double],
            k: Int = 3, nprobe: Int = 1): DataFrame = {
    import spark.implicits._
    queryMany(spark,
      stateDir, Seq((-1L, qvec.map(_.toFloat)))
        .toDF("query_id", "embedding"), k, nprobe)
  }

  /** Maintenance compaction twin ([[graft.streaming.IngestGuard
    * .compactFpStore]]'s contract): one file per cell partition. Stop
    * the index's streaming query first — single-writer. */
  def compactIndex(spark: SparkSession, stateDir: String): Unit =
    Streams.rewriteStore(spark, stateDir, Seq("cell"), Nil)(identity)
}
