package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch table readers over the driver-generated parquet fixtures.
  *
  * In the reference every dataflow is a Kafka topic read as either a STREAM
  * (append-only) or a TABLE (latest-by-key changelog view) — see
  * `/root/reference/ksqldb-statements.sql:42-45` and `readme.md:316-375`.
  * Here the batch entry point is a plain parquet scan: Catalyst handles
  * column pruning + predicate pushdown into the scan, which is the property
  * that matters at 100 TB (only read the columns/row-groups a query needs).
  *
  * The same logical pipelines run over streaming inputs via
  * [[graft.streaming.Streams]].
  */
object Tables {

  /** Timestamp columns per table. Fixture generations have varied the
    * physical type — TIMESTAMP(NANOS) in early rounds (which Spark's
    * vectorized reader rejects; read as raw nano-longs via
    * `spark.sql.legacy.parquet.nanosAsLong` and convert), naive
    * `timestamp[us]` since round 6 (which Spark reads as TIMESTAMP_NTZ).
    * Both are normalized here to session-zoned TimestampType under a UTC
    * session zone, the repo-wide convention: DuckDB (the oracle) reads the
    * same files as naive timestamps whose epoch math treats the wall time
    * as UTC, so UTC is the one interpretation under which Spark's
    * `unix_millis`/window arithmetic agrees with the oracle bit-for-bit. */
  private val tsColumns: Map[String, Seq[String]] = Map(
    "events"   -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders"   -> Seq("o_orderdate"))

  /** One warning per JVM when load() has to flip a non-UTC session zone:
    * the override is required for oracle agreement (see scaladoc above),
    * but a caller that deliberately set another zone for its own
    * casts/displays should hear that it was reverted, not find out from
    * shifted timestamps. Entry points that set UTC at session build
    * (Verify, Bench, StreamBench, the test harness) never trigger it. */
  private val warnedZoneOverride =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Fixture schemas keyed by file path, inferred once per JVM.
    *
    * `spark.read.parquet(path)` re-runs footer schema inference on EVERY
    * call (~70 ms measured on this host — listing + footer open + a small
    * Spark job), and the bench's measurement protocol rebuilds each query
    * 4× (warmup + 3 trials) with 1-3 table loads per build, so inference
    * alone contributed O(100 ms) to most timed medians. Fixture files are
    * immutable within a JVM run (static testdata dirs; generators write a
    * dir once), so the schema is metadata that can be inferred once and
    * passed explicitly — `spark.read.schema(s).parquet(path)` skips
    * inference entirely. This caches no DATA and no results: every query
    * still scans the parquet inputs in full. (Same class of optimization
    * as Spark's own FileStatusCache, guide §6.) */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // NTZ→TIMESTAMP casts read the session zone at execution; pin it so
    // entry points that don't set it (tests, Bench) agree with Verify.
    if (spark.conf.get("spark.sql.session.timeZone") != "UTC") {
      if (warnedZoneOverride.compareAndSet(false, true))
        System.err.println(
          "[graft] Tables.load: overriding spark.sql.session.timeZone -> " +
            "UTC (fixture/oracle convention; set UTC when building the " +
            "SparkSession to keep your own zone out of graft reads)")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    val raw = spark.read.schema(schema).parquet(path)
    tsColumns.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) era
          df.withColumn(c, timestamp_micros(expr(s"$c DIV 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn(c,
            col(c).cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    }
  }

  // TPC-H-ish star schema
  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")

  /** The fact/event stream — plays the role of the reference's `ratings`
    * topic (datagen source, `docker-compose.yml:140-148`). */
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")

  /** Text corpus for the training-data pipeline operators. */
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** Embedding table (`embedding: array<float>`, 64-dim) for similarity ops. */
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Persist `df` bucketed (and sorted) by `keys` into the session catalog.
    * Two tables bucketed the same way co-locate their join keys: the join
    * plans with NO shuffle exchange on either side — at 100 TB this is how
    * repeatedly-joined fact tables amortize their shuffle once at write
    * time (the reference's `PARTITION BY`/co-partitioned-topic analog,
    * SURVEY §4). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: String*): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
}
