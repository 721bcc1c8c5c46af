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

  /** Timestamp columns per table. The fixtures store TIMESTAMP(NANOS), which
    * Spark's vectorized parquet reader rejects; we read them as raw
    * nano-longs (`spark.sql.legacy.parquet.nanosAsLong`) and convert to
    * micro-precision TimestampType. The fixtures carry no sub-microsecond
    * components (verified), so this is lossless and matches DuckDB's
    * TIMESTAMP view of the same files. */
  private val tsColumns: Map[String, Seq[String]] = Map(
    "events"   -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders"   -> Seq("o_orderdate"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    tsColumns.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      if (df.schema(c).dataType == org.apache.spark.sql.types.LongType)
        df.withColumn(c, timestamp_micros(expr(s"$c DIV 1000")))
      else df
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
