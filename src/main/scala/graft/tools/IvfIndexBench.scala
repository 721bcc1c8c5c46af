package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.IvfIndexStream

/** Scale certification for the streaming IVF index
  * ([[IvfIndexStream]]) — the expected-answer-first protocol of
  * [[GuardNearDupCert]] applied to the round-15 component:
  *
  *  1. `expectedOnly=1` computes the ORACLE with batch operators only:
  *     centroids re-derived deterministically from slice 0 (the same
  *     first-`nlist`-by-vec_id seed + Lloyd's the stream will use on
  *     its first microbatch), then [[Similarity.annIvfWith]] over the
  *     FULL corpus — and prints the result-set hash BEFORE any stream
  *     runs.
  *  2. The default mode ingests the corpus one slice per microbatch,
  *     queries the maintained store, and asserts the result set equals
  *     the oracle EXACTLY (same hash), reporting ingest throughput,
  *     the per-slice latency curve (flat = per-batch cost tracks the
  *     batch, not the index), store size, and the query read's
  *     decoded-row fraction (the pruned-read evidence).
  *
  * Usage: `runMain graft.tools.IvfIndexBench <embDir> [expectedOnly]`.
  * Prints one `IVFINDEX {...}` / `IVFINDEX_EXPECTED {...}` JSON line. */
object IvfIndexBench {

  private val NSlices = 10
  private val NList = 16
  private val Dim = 64
  private val K = 10
  private val NQueries = 100
  private val NProbe = 2

  private def slice(emb: DataFrame, s: Int): DataFrame =
    emb.filter(pmod(col("vec_id"), lit(NSlices)) === s)

  /** Stage the corpus as one single-file parquet per slice. BOTH modes
    * derive centroids from the STAGED slice-0 file: a single input
    * split makes the Lloyd's update's partial sums accumulate in row
    * order in one task, so the oracle's centroids are bit-identical to
    * what the stream's first microbatch (the same file) trains. */
  private def stage(spark: SparkSession, emb: DataFrame,
                    dir: String): Seq[String] = {
    (0 until NSlices).map { s =>
      val d = s"$dir/s$s"
      slice(emb, s).coalesce(1).write.mode("overwrite").parquet(d)
      val f = new java.io.File(d).listFiles()
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("."))
      require(f.length == 1, s"expected one staged file for slice $s")
      f.head.getAbsolutePath
    }
  }

  private def oracleCents(spark: SparkSession,
                          slice0: String): Array[Array[Double]] = {
    val s0 = spark.read.parquet(slice0)
      .select(col("vec_id"), col("embedding"))
    val seed = s0.orderBy(col("vec_id")).limit(NList)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    Similarity.trainCentroidsFrom(s0, seed, 5)
  }

  private def queriesOf(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding"))

  private def resultHash(df: DataFrame): (Long, String) = {
    val rows = df.collect()
      .map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getDouble(2)}|${r.getInt(3)}")
      .sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(s => md.update(s.getBytes("UTF-8")))
    (rows.length.toLong,
      md.digest().map("%02x".format(_)).mkString.take(16))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfIndexBench <embDir> [expectedOnly]")
    val expectedOnly = args.length > 1 && args(1).toInt == 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ivfbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(args(0))
      .select(col("vec_id"), col("embedding"))
    val nVecs = emb.count()

    val base = java.nio.file.Files
      .createTempDirectory("graft-ivfbench").toString
    val staged = stage(spark, emb, s"$base/staged")

    if (expectedOnly) {
      val (n, hash) = resultHash(Similarity.annIvfWith(
        emb, oracleCents(spark, staged.head), K, NQueries, NProbe))
      println(s"""IVFINDEX_EXPECTED {"vectors":$nVecs,"rows":$n,"hash":"$hash","k":$K,"queries":$NQueries,"nprobe":$NProbe,"cpus":$cpus}""")
      spark.stop()
      return
    }

    // one slice per microbatch, batch boundaries pinned by copying the
    // staged files into the watched dir one at a time (GuardNearDupCert
    // protocol)
    val inDir = s"$base/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stateDir = s"$base/state"
    val q = IvfIndexStream.start(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir),
      stateDir, s"$base/ckpt", nlist = NList, dim = Dim)
    val sliceSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t0 = System.nanoTime()
    try {
      staged.zipWithIndex.foreach { case (f, i) =>
        val tS = System.nanoTime()
        org.apache.hadoop.fs.FileUtil.copy(fs,
          new org.apache.hadoop.fs.Path(f), fs,
          new org.apache.hadoop.fs.Path(inDir, f"slice_$i%05d.parquet"),
          false, spark.sparkContext.hadoopConfiguration)
        q.processAllAvailable()
        q.exception.foreach(throw _)
        sliceSecs += (System.nanoTime() - tS) / 1e9
      }
    } finally q.stop()
    val ingestSec = (System.nanoTime() - t0) / 1e9

    val got = IvfIndexStream.queryMany(spark, stateDir, queriesOf(emb),
      K, NProbe)
    val tQ0 = System.nanoTime()
    val (n, hash) = resultHash(got)
    val querySec = (System.nanoTime() - tQ0) / 1e9
    val decoded = org.apache.spark.sql.GraftColumnBridge
      .scanOutputRows(got)
    // the pruning evidence: 100 queries x nprobe=2 legitimately probe
    // every one of 16 cells, so the batch metric above reads ~1.0 by
    // construction — ONE query at nprobe=1 shows the per-query read
    // (at production nlist >> 16 the batch fraction shrinks the same way)
    val one = IvfIndexStream.queryMany(spark, stateDir,
      queriesOf(emb).limit(1), K, nprobe = 1)
    one.collect()
    val oneDecoded = org.apache.spark.sql.GraftColumnBridge
      .scanOutputRows(one)
    val (oN, oHash) = resultHash(Similarity.annIvfWith(
      emb, IvfIndexStream.readCentroids(spark, stateDir).get,
      K, NQueries, NProbe))
    def dirMb(p: String): Double = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum() / 1e6
      finally s.close()
    }
    val sorted = sliceSecs.sorted
    val curve = Seq("first" -> sliceSecs.head,
      "median" -> sorted(sorted.length / 2), "last" -> sliceSecs.last)
      .map { case (kk, v) => s""""$kk":${f"$v%.2f"}""" }
      .mkString("{", ",", "}")
    println(s"""IVFINDEX {"vectors":$nVecs,"ingest_vecs_per_sec":${(nVecs / ingestSec).round},"ingest_wall_sec":${f"$ingestSec%.1f"},"rows":$n,"hash":"$hash","oracle_rows":$oN,"oracle_hash":"$oHash","hash_match":${hash == oHash && n == oN},"query_sec":${f"$querySec%.2f"},"query_decoded_rows":$decoded,"decoded_frac":${f"${decoded.toDouble / nVecs}%.3f"},"one_query_decoded_rows":$oneDecoded,"one_query_frac":${f"${oneDecoded.toDouble / nVecs}%.3f"},"store_mb":${f"${dirMb(stateDir)}%.1f"},"slice_sec":$curve,"k":$K,"queries":$NQueries,"nprobe":$NProbe,"cpus":$cpus}""")
    spark.stop()
  }
}
