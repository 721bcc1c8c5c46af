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
