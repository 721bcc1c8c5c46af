package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational
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
      Tables.customer(spark, d))
  }

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
    "q_enrich" -> ((s, d) =>
      Relational.enriched(
        Relational.eventsLive(Tables.events(s, d)),
        Tables.customer(s, d))),

    // F2/R1 — unhappy platinum filter + PARTITION BY re-key
    // (ksqldb-statements.sql:63-68)
    "q_unhappy" -> ((s, d) =>
      Relational.unhappyPlatinum(Relational.enriched(
        Relational.eventsLive(Tables.events(s, d)),
        Tables.customer(s, d)))),

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
