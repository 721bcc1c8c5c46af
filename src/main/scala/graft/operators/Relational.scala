package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operators — the full ksqlDB query surface of the
  * reference, re-expressed as composable DataFrame transforms.
  *
  * Reference queries (cited per function) live in
  * `/root/reference/ksqldb-statements.sql` and `/root/reference/commands.sql`.
  * The driver fixtures play these roles:
  *   - `events`   ≈ the `ratings` stream (event_id/user_id/value/event_type/
  *     props/ts ≈ rating_id/user_id/stars/channel/message/rating_time)
  *   - `customer` ≈ the CDC-sourced `CUSTOMERS` table (c_custkey/c_name/
  *     c_mktsegment ≈ id/name/club_status)
  *
  * Every function is a pure `DataFrame => DataFrame` transform so the exact
  * same logical plan runs in batch and in Structured Streaming
  * ([[graft.streaming.Streams]]). All expressions are built-in
  * `org.apache.spark.sql.functions` (whole-stage-codegen'd, no UDFs).
  */
object Relational {

  /** Exact cross-engine aggregation: sum doubles as DECIMAL(18,4) so the
    * result is order-independent (decimal addition is exact), then cast back
    * to double. At 100 TB this also avoids the non-determinism of partial
    * double sums across shuffle orders. */
  def sumExact(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  // --------------------------------------------------------------------- //
  // F1/E1 — `CREATE STREAM RATINGS_LIVE AS SELECT * FROM RATINGS WHERE
  // LCASE(CHANNEL) NOT LIKE '%test%'` (ksqldb-statements.sql:13-14) and its
  // complement RATINGS_TEST (:16-17).
  // --------------------------------------------------------------------- //
  def eventsLive(events: DataFrame): DataFrame =
    events.filter(!lower(col("event_type")).like("%error%"))

  def eventsError(events: DataFrame): DataFrame =
    events.filter(lower(col("event_type")).like("%error%"))

  // --------------------------------------------------------------------- //
  // J1/J2/E2/E3/F3/P3 — the flagship enrichment join
  // `CREATE STREAM RATINGS_WITH_CUSTOMER_DATA AS SELECT ... FROM RATINGS_LIVE R
  //  LEFT JOIN CUSTOMERS C ON CAST(R.USER_ID AS STRING) = C.CUSTOMER_ID
  //  WHERE C.FIRST_NAME IS NOT NULL` (ksqldb-statements.sql:50-60).
  //
  // Scale notes: the dimension side is tiny relative to the fact stream, so
  // Catalyst picks BroadcastHashJoin (no shuffle of the 100 TB fact side);
  // we assert that in the bench. The join key is cast to string to mirror
  // ksqlDB's `CAST(USER_ID AS STRING) = CUSTOMER_ID` (E3). `full_name` uses
  // `concat`, which is null-propagating exactly like ksqlDB's `+` (E2) —
  // NOT concat_ws, which would skip nulls and diverge.
  // --------------------------------------------------------------------- //

  /** SIZE-GATED broadcast hint (round-7 verdict item 5): apply
    * `broadcast()` only when the optimizer's size estimate fits under the
    * session's `spark.sql.autoBroadcastJoinThreshold`. The reference's
    * CDC dimension is 20 rows, so at fixture scale the hint always fires
    * and PlanSpec still locks BroadcastHashJoin — but an unconditional
    * hint overrides AQE for an over-threshold dimension and would OOM the
    * driver on a hundreds-of-millions-key CDC table instead of degrading
    * to a shuffled join. With the gate, an oversized (or
    * threshold-disabled, −1) dimension carries NO hint and Catalyst/AQE
    * pick the join strategy from runtime statistics. Streaming plans,
    * where the optimizer can't produce a size estimate, fall back to
    * no-hint (microbatch planning re-estimates per batch anyway). */
  private[graft] def broadcastIfSmall(dim: DataFrame): DataFrame = {
    val threshold = org.apache.spark.sql.GraftColumnBridge
      .autoBroadcastThreshold(dim.sparkSession)
    val estimated = scala.util.Try(
      dim.queryExecution.optimizedPlan.stats.sizeInBytes).toOption
    if (threshold > 0 && estimated.exists(_ <= threshold)) broadcast(dim)
    else dim
  }

  def enriched(events: DataFrame, customers: DataFrame): DataFrame = {
    val dim = broadcastIfSmall(
      customers.select(
        col("c_custkey").cast("string").as("customer_id"),
        concat(col("c_name"), lit(" ["), col("c_mktsegment"), lit("]"))
          .as("full_name"),
        col("c_name").as("name"),
        col("c_mktsegment").as("club_status")))
    events
      .select(
        col("event_id").as("rating_id"),
        col("props").as("message"),
        col("value").as("stars"),
        col("event_type").as("channel"),
        col("user_id").cast("string").as("customer_id"),
        col("ts").as("event_ts"))
      .join(dim, Seq("customer_id"), "left")
      // F3: IS NOT NULL on the right side — Catalyst's EliminateOuterJoin
      // rewrites LEFT JOIN + null-rejecting filter to INNER (J2), identical
      // to ksqlDB's observable semantics.
      .filter(col("name").isNotNull)
      .select("rating_id", "message", "stars", "channel", "customer_id",
        "full_name", "club_status", "event_ts")
  }

  // --------------------------------------------------------------------- //
  // F2/R1 — `CREATE STREAM UNHAPPY_PLATINUM_CUSTOMERS AS SELECT ... WHERE
  // STARS < 3 AND CLUB_STATUS = 'platinum' PARTITION BY FULL_NAME`
  // (ksqldb-statements.sql:63-68). `PARTITION BY` re-keys the output stream;
  // in Spark that is `repartition(col)` — an explicit hash Exchange, which a
  // downstream co-partitioned consumer can reuse (shuffle reuse at scale).
  // --------------------------------------------------------------------- //
  def unhappyPlatinum(enrichedDf: DataFrame): DataFrame =
    enrichedDf
      .filter(col("stars") < 3 && col("club_status") === "BUILDING")
      .select("full_name", "club_status", "stars", "message")
      .repartition(col("full_name"))

  // --------------------------------------------------------------------- //
  // A1/A2/A3 — `CREATE TABLE RATINGS_PER_CUSTOMER_PER_15MINUTE AS SELECT
  //  FULL_NAME, COUNT(*), COLLECT_LIST(STARS) FROM RATINGS_WITH_CUSTOMER_DATA
  //  WINDOW TUMBLING (SIZE 15 MINUTE) GROUP BY FULL_NAME`
  // (ksqldb-statements.sql:88-93).
  //
  // `window()` buckets are epoch-aligned tumbling windows, same as ksqlDB.
  // collect_list order is arrival order in both engines, so results are
  // exposed sorted (`sort_array`) to be comparable as multisets.
  // Map-side partial aggregation halves the shuffled volume; the only
  // shuffle is on (window, full_name) — exactly the ksqlDB repartition
  // topic (readme EP3), but with AQE-coalesced partitions.
  // --------------------------------------------------------------------- //
  def ratingsPerCustomerPer15Min(enrichedWithTs: DataFrame): DataFrame =
    enrichedWithTs
      .groupBy(window(col("event_ts"), "15 minutes"), col("full_name"))
      .agg(
        count(lit(1)).as("ratings_count"),
        sort_array(collect_list(col("stars"))).as("ratings"))
      .select(
        col("window.start").as("window_start"),
        col("full_name"), col("ratings_count"), col("ratings"))

  // --------------------------------------------------------------------- //
  // A1 variant — HOPPING windows, ksqlDB's other time-window kind:
  // `WINDOW HOPPING (SIZE 15 MINUTES, ADVANCE BY 5 MINUTES)`
  // (ksqlDB window-types doc; the reference uses TUMBLING but the surface
  // is part of the same WINDOW clause). Spark's `window(col, size, slide)`
  // IS the hopping window — each event lands in size/slide epoch-aligned
  // overlapping buckets, expanded in the projection (no self-join), then
  // one (window, event_type) shuffle with map-side partial counts. The
  // size/slide fanout multiplies shuffled ROWS, not text: only the grouping
  // key and counters ride the exchange, so the 100 TB cost is
  // (size/slide)× a tumbling count, not a data explosion.
  // --------------------------------------------------------------------- //
  def hoppingCountsByType(events: DataFrame, sizeSec: Int = 900,
                          slideSec: Int = 300): DataFrame =
    events
      .groupBy(window(col("ts"), s"$sizeSec seconds", s"$slideSec seconds"),
        col("event_type"))
      .agg(count(lit(1)).as("events_count"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("events_count"))

  // --------------------------------------------------------------------- //
  // A4 — TABLE semantics: latest value per key (implicit LATEST_BY_OFFSET).
  // `CREATE TABLE CUSTOMERS (CUSTOMER_ID VARCHAR PRIMARY KEY) ...`
  // (ksqldb-statements.sql:42-43); demonstrated at readme.md:316-342.
  //
  // Batch form: row_number over (key ORDER BY ordering DESC) == 1. A single
  // hash shuffle on the key; at 100 TB prefer this over groupBy+max_by+join
  // (one shuffle, no second pass). Streaming form lives in graft.cdc.Cdc.
  // --------------------------------------------------------------------- //
  def latestByKey(df: DataFrame, key: String, ordering: Column*): DataFrame =
    latestByKeys(df, Seq(key), ordering: _*)

  /** Multi-column-key form of [[latestByKey]] — e.g. a windowed table keyed
    * by (window_start, group). Same single-shuffle shape. */
  def latestByKeys(df: DataFrame, keys: Seq[String], ordering: Column*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // --------------------------------------------------------------------- //
  // D2 — Kibana "median stars over time by club_status"
  // (docker-compose.yml:347): percentiles(50) × date_histogram × terms.
  // Exact `percentile` (interpolated, = DuckDB quantile_cont) for the
  // oracle; `percentile_approx` is the 100 TB path (single-pass sketch, no
  // sort) — both exposed.
  // --------------------------------------------------------------------- //
  def medianOverTime(events: DataFrame, interval: String): DataFrame =
    events
      .groupBy(window(col("ts"), interval), col("event_type"))
      .agg(round(percentile(col("value"), lit(0.5)), 4).as("median_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("median_value"))

  def medianOverTimeApprox(events: DataFrame, interval: String): DataFrame =
    events
      .groupBy(window(col("ts"), interval), col("event_type"))
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000))
        .as("median_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("median_value"))

  /** Tail-latency panel: exact interpolated p50/p95/p99 of `value` per
    * (window, type) — the SLO dashboard's standard triple. One shuffle on
    * the composite window key; the three quantiles come out of ONE sort
    * of each group's values (Spark evaluates the percentile triple over a
    * single buffer), and at 100 TB the drop-in sketch twin is
    * `percentile_approx` exactly as with [[medianOverTimeApprox]]. */
  def latencyPercentiles(events: DataFrame, interval: String): DataFrame =
    events
      .groupBy(window(col("ts"), interval), col("event_type"))
      .agg(
        round(percentile(col("value"), lit(0.5)), 4).as("p50"),
        round(percentile(col("value"), lit(0.95)), 4).as("p95"),
        round(percentile(col("value"), lit(0.99)), 4).as("p99"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("p50"), col("p95"), col("p99"), col("n"))

  // --------------------------------------------------------------------- //
  // D3 — count × date_histogram × terms(channel, top 5 by count)
  // (docker-compose.yml:348).
  // --------------------------------------------------------------------- //
  def countsByTypeOverTime(events: DataFrame, interval: String): DataFrame =
    events
      .groupBy(window(col("ts"), interval), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"), col("event_type"), col("n"))

  // --------------------------------------------------------------------- //
  // D4 — top-k terms: ratings count per full_name, size 5 desc
  // (docker-compose.yml:349). Deterministic tie-break on the key.
  // At scale: groupBy-count is a partial-agg shuffle; the top-5 is a
  // TakeOrderedAndProject (no global sort materialization).
  // --------------------------------------------------------------------- //
  def topKByCount(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol).asc)
      .limit(k)

  /** Per-user event-type PIVOT — the wide activity matrix a dashboard
    * feeds from, as N codegen'd conditional counts (`COUNT(CASE WHEN …)`)
    * in ONE aggregate. Deliberately NOT `Dataset.pivot`: even with
    * explicit values it plans TWO exchanges (a (user, type) pre-count,
    * then a pivotfirst re-shuffle on user) — conditional counts do it in
    * one user_id shuffle with map-side partials, and the explicit value
    * list keeps the schema static (a value-discovering pivot adds a
    * distinct scan and a data-dependent schema — both wrong at 100 TB).
    * `count` of a CASE is never null, so the matrix is dense by
    * construction. */
  def eventTypePivot(events: DataFrame,
                     types: Seq[String]): DataFrame = {
    val cells = types.map(t =>
      count(when(col("event_type") === t, 1)).as(t))
    events.groupBy(col("user_id")).agg(cells.head, cells.tail: _*)
  }

  /** User growth curve: first-seen date per user → daily new-user counts →
    * running cumulative total. The corpus-sized work is the first-seen
    * aggregate (one user_id shuffle, map-side `min`); the running sum's
    * partition-less window runs over the DAILY AGGREGATE — one row per
    * day, thousands of rows at any corpus size — so the "global window"
    * scale-killer does not apply (same argument as the centroid collects:
    * bounded by the calendar, not the data). */
  def userGrowth(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
    val daily = firstSeen
      .groupBy(date_trunc("day", col("first_ts")).as("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(col("day"), col("new_users"),
      sum(col("new_users")).over(w).as("cum_users"))
  }

  /** Per-type z-score anomaly flags — the outlier alert behind every
    * metric monitor. Determinism at any parallelism: the two moments are
    * DECIMAL-exact sums (a double `stddev` is association-order-dependent
    * and differs across engines and cluster sizes); mean/variance are then
    * computed from those exact sums in double arithmetic, identically
    * everywhere. The per-type moment table (one row per type) broadcasts
    * back onto the scan — one shuffle of (type, 3 decimals) partials.
    * DECIMAL(38,12) squares bound |value| < ~10¹³ with counts to ~10¹². */
  def valueZScores(events: DataFrame, threshold: Double = 3.0): DataFrame = {
    val dec = col("value").cast(DecimalType(18, 6))
    val stats = events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(dec).as("s"),
      sum((dec * dec).cast(DecimalType(38, 12))).as("ss"))
    val withM = stats.select(col("event_type"), col("n"),
      (col("s").cast("double") / col("n")).as("mean"),
      sqrt((col("ss").cast("double")
        - col("s").cast("double") * col("s").cast("double") / col("n"))
        / (col("n") - 1)).as("std"))
    events.join(broadcast(withM), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mean")) / col("std"), 6).as("z"))
      .withColumn("is_outlier", (abs(col("z")) > threshold).cast("int"))
  }

  /** Per-user inter-arrival statistics — the activity-cadence rollup
    * (bot/burst detection, engagement scoring): consecutive-event gaps
    * from one `lag` window, then count/mean/max per user. One user_id
    * shuffle reused by both the window sort and the rollup; gap seconds
    * are integer-exact so the mean is deterministic at any parallelism. */
  def interArrivalStats(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"),
        (unix_timestamp(col("ts"))
          - unix_timestamp(lag(col("ts"), 1).over(w))).as("gap_sec"))
      .filter(col("gap_sec").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        round(sum(col("gap_sec")).cast("double") / count(lit(1)), 6)
          .as("avg_gap_sec"),
        max(col("gap_sec")).as("max_gap_sec"))
  }

  /** Conversion FUNNEL over ordered stages: a user "reaches" stage i when
    * they have an event of every stage ≤ i and the first occurrences are
    * in stage order (the standard ordered-funnel definition — a purchase
    * before ever signing up does not count as conversion). Emits one row
    * per stage with the user count, the dashboard funnel chart's input.
    *
    * Scale shape: ONE user_id shuffle computes the per-user first-seen
    * timestamp of every stage as conditional `min`s (map-side partials);
    * the reach flags and the per-stage totals are a projection plus a
    * 1-row aggregate `stack`ed to (stage, idx, users) rows — nothing
    * downstream of the single corpus shuffle is bigger than one row per
    * user. */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    val mins = stages.zipWithIndex.map { case (s, i) =>
      min(when(col("event_type") === s, col("ts"))).as(s"t$i")
    }
    val perUser = events.groupBy(col("user_id")).agg(mins.head, mins.tail: _*)
    val reached = stages.indices.map { i =>
      val ordered = (1 to i).map(j =>
        s"t$j IS NOT NULL AND t$j >= t${j - 1}").mkString(" AND ")
      val cond = if (i == 0) "t0 IS NOT NULL"
                 else s"t0 IS NOT NULL AND $ordered"
      sum(expr(s"CASE WHEN $cond THEN 1 ELSE 0 END")).as(s"s$i")
    }
    val stackArgs = stages.zipWithIndex
      .map { case (s, i) => s"'$s', $i, s$i" }.mkString(", ")
    perUser.agg(reached.head, reached.tail: _*)
      .selectExpr(
        s"stack(${stages.length}, $stackArgs) AS (stage, idx, users)")
  }

  /** Retention COHORTS: users grouped by first-seen day, counted by how
    * many days later they were active — the triangle matrix behind every
    * retention dashboard. Two bounded shuffles: first-seen per user (one
    * user_id exchange), then the (cohort_day, day_offset) rollup whose
    * key space is days × horizon, not users. The first-seen table is one
    * row per user — a relation that GROWS with the data — so it carries no
    * broadcast hint: AQE picks BHJ while it fits the threshold and a
    * shuffled join on the 8-byte user_id (never event payloads) once it
    * doesn't. A forced hint here would override AQE's size statistics and
    * OOM at large user cardinality. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy(col("user_id"))
      .agg(date_trunc("day", min(col("ts"))).as("cohort_day"))
    events.select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
      .join(firstSeen, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Top-k keys WITHIN each group — the per-dimension leaderboard
    * (`topKByCount` is the global form): grouped counts, then a rank
    * window partitioned by the group. Two shuffles of (group, key, count)
    * triples with map-side partial counts; the window partitions by group,
    * so no single-partition sort ever forms. Ties break to the smaller
    * key for determinism. */
  def topKPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                   k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("n").desc, col(keyCol).asc)
    df.groupBy(col(groupCol), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Per-user rolling aggregates over the event stream — moving sum/avg of
    * the last `frameRows + 1` events and the running total, the standard
    * activity-trend derivation. One hash shuffle on user_id; both frames
    * reuse the same sort. Sums run on DECIMAL so the result is
    * order-exact (a double sum's value depends on association order,
    * which differs between engines and between cluster sizes). */
  def movingAgg(events: DataFrame, frameRows: Int = 3): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val moving = byUser.rowsBetween(-frameRows, Window.currentRow)
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = col("value").cast(DecimalType(18, 6))
    events.select(
      col("user_id"), col("event_id"), col("ts"),
      sum(dec).over(moving).cast("double").as("moving_sum"),
      // divide as DOUBLE from the exact decimal sum — decimal division
      // scale rules differ across engines, double division does not
      round(sum(dec).over(moving).cast("double")
        / count(lit(1)).over(moving), 6).as("moving_avg"),
      sum(dec).over(running).cast("double").as("running_sum"))
  }

  // --------------------------------------------------------------------- //
  // Sessionization: gap-based user sessions — the canonical event-analytics
  // derivation over a stream table. Two windows over one hash shuffle on
  // user_id: lag() marks session starts (gap > threshold), a running sum of
  // start-markers numbers the sessions; the grouped rollup then reuses the
  // same (user_id) clustering. At 100 TB: one shuffle of the events table,
  // all codegen'd. Streaming twin: groupBy(session_window(ts, gap)).
  // --------------------------------------------------------------------- //
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_start",
        (col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapMinutes * 60L)
          .cast("int"))
      .withColumn("session_id", sum(col("is_start")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sumExact(col("value")).as("total_value"))
  }

  /** Gap-based sessions via the built-in `session_window` — the batch
    * twin of [[graft.streaming.Streams.sessionizeStream]], so the lake
    * backfill and the live stream share ONE definition of "session"
    * (window = [first_ts, last_ts + gap); an event extends the session
    * when it lands within `gap` of the previous one). Same single
    * user-key shuffle as [[sessionize]]; differs from it only in the end
    * bound (+gap, the streaming-emission convention) and in emitting no
    * per-user ordinal. Boundary semantics verified empirically: an event
    * EXACTLY `gap` after its predecessor merges (inclusive), identical to
    * the islands form's strict `diff > gap` new-session test — the two
    * definitions agree even at the boundary. Fixture timestamps carry
    * microsecond components, so the merge compare runs at micro precision
    * in both engines. */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        sumExact(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  // --------------------------------------------------------------------- //
  // D5 — sorted detail search: latest-n events by timestamp desc
  // (docker-compose.yml:344-345, sort on EXTRACT_TS desc). Physical plan is
  // TakeOrderedAndProject — per-partition top-n then a single-driver merge
  // of n×partitions rows, never a global sort of the 100 TB input.
  // --------------------------------------------------------------------- //
  def sortedRecent(events: DataFrame, n: Int): DataFrame =
    events.orderBy(col("ts").desc, col("event_id").desc).limit(n)

  // --------------------------------------------------------------------- //
  // Engagement stickiness — avg-DAU / WAU per week, the DAU/MAU-family
  // ratio on every product dashboard. One exchange of DISTINCT
  // (week, day, user) triples does the heavy lifting; both rollups (daily
  // actives, weekly distinct actives) run over that already-deduped table,
  // whose cardinality is active-user-days — bounded by real engagement,
  // not event volume. The avg divides decimal-exact BIGINT sums as double
  // (repo convention), so the ratio is partitioning-independent.
  // --------------------------------------------------------------------- //
  def stickiness(events: DataFrame): DataFrame = {
    val triples = events.select(
        date_trunc("week", col("ts")).as("week"),
        date_trunc("day", col("ts")).as("day"),
        col("user_id"))
      .distinct()
    val dau = triples.groupBy(col("week"), col("day"))
      .agg(count(lit(1)).as("dau"))
      .groupBy(col("week"))
      .agg((sum(col("dau")).cast("double") /
        count(lit(1)).cast("double")).as("avg_dau"))
    val wau = triples.select(col("week"), col("user_id")).distinct()
      .groupBy(col("week")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "week")
      .select(col("week"), round(col("avg_dau"), 6).as("avg_dau"), col("wau"),
        round(col("avg_dau") / col("wau"), 6).as("stickiness"))
  }

  // --------------------------------------------------------------------- //
  // Weekly growth accounting — every weekly active user classified as
  // new (first-ever week), retained (also active the previous week) or
  // resurrected (active before, but not last week); churned counts last
  // week's actives who went silent this week. The canonical startup
  // growth ledger: new + retained + resurrected = WAU, and churn is the
  // other side of retention.
  //
  // Scale shape: ONE distinct (user_id, week) exchange is the base table;
  // first-seen is a min-rollup of it; previous-week activity is a
  // SELF-join of the weekly table shifted by 7 days — all joins carry
  // (8-byte user, timestamp) pairs, cardinality = active-user-weeks.
  // Weeks after the observed range never appear (churn of the final week
  // is unobservable by construction in both engines).
  // --------------------------------------------------------------------- //
  def growthAccounting(events: DataFrame): DataFrame = {
    val weekly = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val firstSeen = weekly.groupBy(col("user_id"))
      .agg(min(col("week")).as("first_week"))
    val prev = weekly.select(col("user_id"),
      (col("week") + expr("INTERVAL 7 DAYS")).as("week"),
      lit(1).as("was_active"))
    val classified = weekly
      .join(firstSeen, "user_id")
      .join(prev, Seq("user_id", "week"), "left")
      .select(col("week"),
        when(col("week") === col("first_week"), "new")
          .when(col("was_active").isNotNull, "retained")
          .otherwise("resurrected").as("status"))
      .groupBy(col("week"))
      .agg(
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("new_users"),
        sum(when(col("status") === "retained", 1L).otherwise(0L))
          .as("retained_users"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L))
          .as("resurrected_users"))
    // churned in week w: active in w-7d, absent in w — only for weeks that
    // exist in the observed range (the final week's churn is unobservable)
    val churned = prev.join(weekly, Seq("user_id", "week"), "left_anti")
      .join(weekly.select(col("week")).distinct(), Seq("week"), "left_semi")
      .groupBy(col("week"))
      .agg(count(lit(1)).as("churned_users"))
    classified.join(churned, Seq("week"), "left")
      .select(col("week"), col("new_users"), col("retained_users"),
        col("resurrected_users"),
        coalesce(col("churned_users"), lit(0L)).as("churned_users"))
  }
}
