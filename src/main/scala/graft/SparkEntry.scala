package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Relational}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator row from SURVEY.md §2 (or a
  * training-data-pipeline extension), expressed over the driver fixtures at
  * `sfDir`; `oracleSql` carries the DuckDB-equivalent SQL the driver uses as
  * the correctness oracle. Column aliases are kept identical on both sides
  * (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * This is the reference's flagship enrichment pipeline
    * (RATINGS → filter → join CUSTOMERS → project,
    * ksqldb-statements.sql:50-60). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Relational.enriched(
      Relational.eventsLive(Tables.events(spark, d)),
      Tables.customer(spark, d)).drop("event_ts")
  }

  /** Shared building block: live events enriched with customer data,
    * event timestamp retained for windowing. */
  private def enrichedTs(s: SparkSession, d: String): DataFrame =
    Relational.enriched(
      Relational.eventsLive(Tables.events(s, d)), Tables.customer(s, d))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/P1 — topic scan + projection (commands.sql:16)
    "q_scan_project" -> ((s, d) =>
      Tables.events(s, d).select("event_id", "user_id", "value", "event_type")),

    // F1/E1 — LCASE + NOT LIKE filter (ksqldb-statements.sql:13-14)
    "q_filter_live" -> ((s, d) => Relational.eventsLive(Tables.events(s, d))),

    // F1 complement — RATINGS_TEST (ksqldb-statements.sql:16-17)
    "q_filter_error" -> ((s, d) => Relational.eventsError(Tables.events(s, d))),

    // J1/J2/E2/E3/F3 — flagship enrichment join (ksqldb-statements.sql:50-60)
    "q_enrich" -> ((s, d) => enrichedTs(s, d).drop("event_ts")),

    // F2/R1 — unhappy platinum filter + PARTITION BY re-key
    // (ksqldb-statements.sql:63-68)
    "q_unhappy" -> ((s, d) =>
      Relational.unhappyPlatinum(enrichedTs(s, d))),

    // A1/A2/A3 — 15-min tumbling window agg with COUNT + COLLECT_LIST
    // (ksqldb-statements.sql:88-93)
    "q_window_agg" -> ((s, d) =>
      Relational.ratingsPerCustomerPer15Min(enrichedTs(s, d))),

    // A4 — TABLE latest-by-key semantics (ksqldb-statements.sql:42-43)
    "q_latest_by_key" -> ((s, d) =>
      Relational.latestByKey(Tables.events(s, d), "user_id",
        col("ts"), col("event_id"))),

    // S3/T1/T2 — CDC envelope unwrap (Debezium ExtractNewRecordState SMT,
    // ksqldb-statements.sql:31-34)
    "q_cdc_unwrap" -> ((s, d) => Cdc.unwrap(Cdc.envelope(Tables.events(s, d)))),

    // S3+A4 — CDC changelog → table with DELETE (tombstone) handling
    "q_cdc_latest" -> ((s, d) =>
      Cdc.latestByKeyTable(Cdc.envelope(Tables.events(s, d)))),

    // D2 — median over time by group (Kibana percentiles(50) ×
    // date_histogram × terms, docker-compose.yml:347)
    "q_median_by_type" -> ((s, d) =>
      Relational.medianOverTime(Tables.events(s, d), "1 hour")),

    // D3 — count histogram by type over time (docker-compose.yml:348)
    "q_counts_by_type" -> ((s, d) =>
      Relational.countsByTypeOverTime(Tables.events(s, d), "1 hour")),

    // D4 — top-k terms by count (docker-compose.yml:349)
    "q_topk_users" -> ((s, d) =>
      Relational.topKByCount(Tables.events(s, d), "user_id", 5)),

    // D5 — sorted detail search, latest 100 (docker-compose.yml:344-345)
    "q_sorted_recent" -> ((s, d) =>
      Relational.sortedRecent(Tables.events(s, d), 100)),

    // E4 — TIMESTAMPTOSTRING(ts, fmt) (readme.md:325, :614)
    "q_ts_format" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))),

    // EXTRACTJSONFIELD analog — JSON field extraction from props
    "q_json_extract" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))),

    // Headline TPC-H-style pricing summary (bench headline; exercises
    // multi-column grouped agg with exact decimal sums at scale)
    "q1_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Relational.sumExact(col("l_quantity")).as("sum_qty"),
          Relational.sumExact(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,4)") *
              (lit(1) - col("l_discount").cast("decimal(18,4)")))
            .cast("double").as("sum_disc_price"),
          (Relational.sumExact(col("l_quantity")) / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("cnt"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT event_id, user_id, value, event_type FROM events",

    "q_filter_live" ->
      "SELECT * FROM events WHERE lower(event_type) NOT LIKE '%error%'",

    "q_filter_error" ->
      "SELECT * FROM events WHERE lower(event_type) LIKE '%error%'",

    "q_enrich" -> """
      SELECT e.event_id AS rating_id, e.props AS message, e.value AS stars,
             e.event_type AS channel, CAST(e.user_id AS VARCHAR) AS customer_id,
             c.c_name || ' [' || c.c_mktsegment || ']' AS full_name,
             c.c_mktsegment AS club_status
      FROM events e
      LEFT JOIN customer c ON CAST(e.user_id AS VARCHAR) = CAST(c.c_custkey AS VARCHAR)
      WHERE lower(e.event_type) NOT LIKE '%error%' AND c.c_name IS NOT NULL
    """,

    "q_unhappy" -> """
      SELECT c.c_name || ' [' || c.c_mktsegment || ']' AS full_name,
             c.c_mktsegment AS club_status, e.value AS stars, e.props AS message
      FROM events e
      JOIN customer c ON CAST(e.user_id AS VARCHAR) = CAST(c.c_custkey AS VARCHAR)
      WHERE lower(e.event_type) NOT LIKE '%error%'
        AND e.value < 3 AND c.c_mktsegment = 'BUILDING'
    """,

    "q_window_agg" -> """
      WITH e AS (
        SELECT c.c_name || ' [' || c.c_mktsegment || ']' AS full_name,
               e.value AS stars, e.ts
        FROM events e
        JOIN customer c ON CAST(e.user_id AS VARCHAR) = CAST(c.c_custkey AS VARCHAR)
        WHERE lower(e.event_type) NOT LIKE '%error%'
      )
      SELECT TIMESTAMP '1970-01-01 00:00:00'
               + INTERVAL 1 SECOND * CAST(floor(epoch(ts)/900)*900 AS BIGINT)
               AS window_start,
             full_name,
             COUNT(*) AS ratings_count,
             list_sort(list(stars)) AS ratings
      FROM e GROUP BY 1, 2
    """,

    "q_latest_by_key" -> """
      SELECT * FROM events
      QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,

    "q_cdc_unwrap" -> """
      SELECT event_id AS id, user_id, event_type, value, props,
             CASE WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
             epoch_ms(ts) AS ts_ms
      FROM events WHERE event_id % 10 <> 0
    """,

    "q_cdc_latest" -> """
      WITH env AS (
        SELECT CAST(user_id AS VARCHAR) AS key,
               CASE WHEN event_id % 10 = 0 THEN 'd'
                    WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END AS op,
               event_id, user_id, event_type, value, props,
               epoch_ms(ts) AS ts_ms
        FROM events
      )
      SELECT event_id AS id, user_id, event_type, value, props, ts_ms
      FROM env
      QUALIFY row_number() OVER (
          PARTITION BY key ORDER BY ts_ms DESC, event_id DESC) = 1
        AND op <> 'd'
    """,

    "q_median_by_type" -> """
      SELECT date_trunc('hour', ts) AS bucket_start, event_type,
             round(quantile_cont(value, 0.5), 4) AS median_value
      FROM events GROUP BY 1, 2
    """,

    "q_counts_by_type" -> """
      SELECT date_trunc('hour', ts) AS bucket_start, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    """,

    "q_topk_users" -> """
      SELECT user_id, COUNT(*) AS n FROM events
      GROUP BY 1 ORDER BY n DESC, user_id ASC LIMIT 5
    """,

    "q_sorted_recent" -> """
      SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 100
    """,

    "q_ts_format" -> """
      SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
      FROM events
    """,

    "q_json_extract" -> """
      SELECT event_id,
             CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k_val
      FROM events
    """,

    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    """
  )
}
