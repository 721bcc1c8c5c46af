package graft.api

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.Relational
import graft.sinks.{BulkTransport, EsSink}
import graft.streaming.Streams

/** The engine's programmatic surface — ksqlDB's DDL/metadata + persistent-
  * query lifecycle (SURVEY §2.10) as a thin registry over Structured
  * Streaming.
  *
  * In the reference every `CREATE STREAM ... AS SELECT` registers a named
  * persistent query that survives until `DROP`/terminate
  * (`/root/reference/ksqldb-statements.sql`, `readme.md:150` `SHOW
  * QUERIES`). Here a named query is a named `StreamingQuery`; the registry
  * provides start/stop/list/describe — the capability the reference exposes
  * over its REST API (`rest_example.sh:30-99`) is this Scala API itself.
  */
class Engine(val spark: SparkSession) {

  private val queries = TrieMap.empty[String, StreamingQuery]
  // name -> (changelog path, key columns) for upsert-materialized tables
  private val upserts = TrieMap.empty[String, (String, Seq[String])]

  /** Check-and-start under one lock: REST handlers run concurrently (the
    * server uses a thread pool), so a bare contains-then-put would let two
    * simultaneous CREATEs both pass the check, start two queries, and
    * orphan the one whose registry entry gets overwritten — a running
    * query nothing can ever TERMINATE. */
  private def register(name: String)(start: => StreamingQuery): StreamingQuery =
    queries.synchronized {
      require(!queries.contains(name), s"query '$name' already exists")
      val q = start
      queries.put(name, q)
      q
    }

  /** CSAS: start a named continuous query materializing `df` to an
    * in-memory table of the same name (the test/demo sink; production
    * sinks via [[sinkToEs]]/[[Streams.toKafka]]). */
  def createStreamAs(name: String, df: DataFrame,
                     mode: OutputMode = OutputMode.Append()): StreamingQuery =
    register(name)(Streams.toMemoryTable(df, name, mode))

  /** CTAS of an aggregate table in UPDATE mode — ksqlDB's windowed-table
    * materialization (changes to a changelog, state store serves pulls;
    * ksqldb-statements.sql:96-110). Each microbatch appends only changed
    * keys ([[Streams.toUpsertTable]]); [[pullQuery]] sees the compacted
    * latest-per-key view under `name`. */
  def createUpsertTableAs(name: String, df: DataFrame, keys: Seq[String],
                          dir: String,
                          compactEvery: Int = 0): StreamingQuery = {
    val q = register(name)(
      Streams.toUpsertTable(df, s"$dir/store", s"$dir/checkpoint",
        compactEvery, keys))
    upserts.put(name, (s"$dir/store", keys))
    q
  }

  /** Re-register the compacted view of every upsert table (no-op for a
    * table whose changelog hasn't received its first batch yet). */
  private def refreshUpsertViews(): Unit =
    upserts.foreach { case (name, (path, keys)) =>
      try Streams.upsertView(spark, path, keys).createOrReplaceTempView(name)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }

  /** CTAS with ES sink — the reference's sink-connector path. */
  def sinkToEs(name: String, df: DataFrame, index: String,
               idCol: Option[String], checkpoint: String,
               transport: BulkTransport): StreamingQuery =
    register(name)(EsSink.writeStream(df, index, idCol, checkpoint, transport))

  /** `SHOW QUERIES` (readme.md:150). */
  def showQueries: Seq[(String, Boolean)] =
    queries.toSeq.map { case (n, q) => (n, q.isActive) }.sortBy(_._1)

  /** `SHOW STREAMS` (ksqlDB metadata surface): persistent queries that are
    * NOT upsert-table materializations. */
  def showStreams: Seq[String] =
    queries.keys.filterNot(upserts.contains).toSeq.sorted

  /** `SHOW TABLES` (readme.md:164's ksqlDB-side analog): the
    * upsert-materialized tables. */
  def showTables: Seq[String] = upserts.keys.toSeq.sorted

  /** `SHOW TOPICS` (readme.md:100): every named dataflow visible to SQL.
    * Kafka topics are the reference's universal dataflow handle; here the
    * analog is the session catalog's table/view namespace — source views,
    * CSAS memory tables, and upsert views all land there. */
  def showTopics: Seq[String] = {
    refreshUpsertViews()
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted
  }

  /** `DROP STREAM/TABLE <name>`: terminate the backing query (if any) and
    * remove the materialized view from the catalog. */
  def drop(name: String): Unit = {
    terminate(name)
    upserts.remove(name)
    spark.catalog.dropTempView(name)
    ()
  }

  /** `DESCRIBE [EXTENDED]` (readme.md:229): schema of a materialized table.
    * Refreshes upsert views first so DESCRIBE works on an upsert table
    * before any pull query has touched it. */
  def describe(name: String): String = {
    refreshUpsertViews()
    spark.table(name).schema.treeString
  }

  /** `DROP`/terminate a persistent query. */
  def terminate(name: String): Unit =
    queries.remove(name).foreach(_.stop())

  def terminateAll(): Unit = queries.keys.foreach(terminate)

  /** Pull query (SURVEY §2.10): point-in-time SQL over a materialized
    * table; returns and terminates — never a continuous subscription.
    * Upsert tables resolve to their latest-per-key compacted view. */
  def pullQuery(sql: String): DataFrame = {
    refreshUpsertViews()
    spark.sql(sql)
  }

  /** Block until every registered query has processed all available input
    * (test/demo determinism helper). */
  def processAllAvailable(): Unit = {
    queries.values.filter(_.isActive).foreach(_.processAllAvailable())
    refreshUpsertViews()
  }
}

/** The reference's full EP2/EP3 topology (SURVEY §3) wired as one call:
  * ratings stream → live filter → customer enrichment → unhappy-platinum
  * alert stream + 15-minute windowed aggregate, each a named persistent
  * query — the Spark equivalent of running every statement in
  * `ksqldb-statements.sql`. */
object ReferencePipeline {

  /** Starts 4 persistent queries; returns the engine managing them.
    * `events` may be a streaming or batch-derived DataFrame; `customers`
    * is the dimension snapshot (stream-static join side).
    *
    * The windowed table materializes in UPDATE mode through the upsert
    * changelog (`upsertDir`) — per batch only changed (window, customer)
    * rows are written, never the whole table (Complete-mode re-emission
    * was the round-1 shape and a scale-killer; see
    * [[graft.streaming.Streams.toUpsertTable]]). */
  def start(engine: Engine, events: DataFrame, customers: DataFrame,
            upsertDir: String = java.nio.file.Files
              .createTempDirectory("graft-upsert").toString): Engine = {
    val live = Relational.eventsLive(events)
    val enriched = Relational.enriched(live, customers)
    engine.createStreamAs("ratings_live", live)
    engine.createStreamAs("ratings_with_customer_data",
      enriched.drop("event_ts"))
    engine.createStreamAs("unhappy_platinum_customers",
      Relational.unhappyPlatinum(enriched))
    engine.createUpsertTableAs("ratings_per_customer_per_15minute",
      Relational.ratingsPerCustomerPer15Min(enriched),
      Seq("window_start", "full_name"), upsertDir)
    engine
  }
}
