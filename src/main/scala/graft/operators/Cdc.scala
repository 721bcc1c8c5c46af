package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-envelope processing — the Debezium side of the reference.
  *
  * The reference CDC path (`/root/reference/ksqldb-statements.sql:19-38`)
  * runs a Debezium MySQL source whose records are an envelope
  * `{before, after, source, op, ts_ms}`; two SMTs flatten it before it ever
  * reaches ksqlDB: `ExtractNewRecordState` (unwrap → after-image row, T1)
  * and `ExtractField$Key` (struct key → scalar id, T2). The ksqlDB `CUSTOMERS`
  * table then materializes latest-value-per-key (A4,
  * `ksqldb-statements.sql:42-43`, demo at `readme.md:316-342`).
  *
  * Spark has no binlog reader, so parity is *processing* CDC events, not
  * producing them (SURVEY §2.1 S3): [[envelope]] synthesizes a deterministic
  * CDC stream from the `events` fixture; [[unwrap]] and [[latestByKeyTable]]
  * are the engine operators under test. All transforms are null-safe struct
  * ops that run identically in batch and Structured Streaming.
  *
  * Scale notes: the envelope is a nested struct column — Parquet/Tungsten
  * keep it columnar, and `select($"after.*")` is a pure projection (no
  * shuffle). The latest-by-key materialization is the only shuffle (hash by
  * key), identical to Debezium→compacted-topic semantics.
  */
object Cdc {

  /** Deterministic synthetic CDC envelope over the `events` fixture.
    * op: every 10th event is a DELETE (tombstone, null after-image), every
    * 3rd an UPDATE, the rest CREATEs — mirroring Debezium's c/u/d ops.
    * `offset` stands in for the binlog position (Debezium `source.pos`);
    * `ts_ms` is Debezium's envelope timestamp.
    */
  def envelope(events: DataFrame): DataFrame = {
    val op = when(col("event_id") % 10 === 0, lit("d"))
      .when(col("event_id") % 3 === 0, lit("u"))
      .otherwise(lit("c"))
    val image = struct(
      col("event_id").as("id"),
      col("user_id"),
      col("event_type"),
      col("value"),
      col("props"))
    events.select(
      // T2 ExtractField$Key: scalar key, not a struct key
      col("user_id").cast("string").as("key"),
      when(op === "d", lit(null)).otherwise(image).as("after"),
      op.as("op"),
      unix_millis(col("ts")).as("ts_ms"),
      col("event_id").as("offset"))
  }

  /** T1 `ExtractNewRecordState` ("unwrap"): envelope → after-image rows.
    * Deletes become tombstones (null after) and are dropped, matching the
    * SMT's default `drop.tombstones=true`. */
  def unwrap(envelope: DataFrame): DataFrame =
    envelope
      .filter(col("op") =!= "d")
      .select(col("after.*"), col("op"), col("ts_ms"))

  /** A4 TABLE semantics over a CDC changelog: latest envelope per key wins;
    * if the latest op is a DELETE the key disappears from the table
    * (SURVEY §7.4 hard-part 5). One hash shuffle on the key. */
  def latestByKeyTable(envelope: DataFrame): DataFrame =
    Relational.latestByKey(envelope, "key", col("ts_ms"), col("offset"))
      .filter(col("op") =!= "d")
      .select(col("after.*"), col("ts_ms"))

  /** SCD type-2 history from the CDC changelog — the warehouse-side
    * materialization every Debezium pipeline eventually needs: one row
    * per VERSION of a key with its validity interval, instead of
    * [[latestByKeyTable]]'s current snapshot. `valid_from` is the
    * envelope timestamp; `valid_to` is the NEXT envelope's timestamp for
    * the key (half-open intervals chain gaplessly); the newest version is
    * open-ended (`valid_to` null, `is_current` 1) unless a DELETE closed
    * it — delete envelopes close the prior version's interval but emit no
    * row themselves, so a deleted key has history and no current row.
    * One hash shuffle on the key (the same distribution the latest-table
    * uses); `lead` over (ts_ms, offset) makes tie order binlog-exact. */
  def scd2History(envelope: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("ts_ms"), col("offset"))
    envelope
      .withColumn("valid_to", lead(col("ts_ms"), 1).over(w))
      .filter(col("op") =!= "d")
      .select(col("key"), col("after.*"),
        col("ts_ms").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }

  /** Time travel: the table AS OF `tsMs` reconstructed from the SCD2
    * history — the version whose half-open validity interval contains the
    * instant. A pure filter over [[scd2History]] (at rest this is a
    * partition-prunable predicate on a history table; no join, no extra
    * shuffle beyond the history's own). Keys deleted before `tsMs` have a
    * closed last interval and correctly vanish. */
  def snapshotAt(envelope: DataFrame, tsMs: Long): DataFrame =
    scd2History(envelope)
      .filter(col("valid_from") <= tsMs &&
        (col("valid_to").isNull || col("valid_to") > tsMs))
      .drop("valid_to", "is_current")

  /** [[envelope]] plus Debezium's `before` image: for each key's envelope
    * (in binlog = `offset` order) the previous envelope's after-image, or
    * null for the key's first event — exactly what
    * `ExtractNewRecordState` drops and a real Debezium envelope carries
    * natively (`{before, after, op}`). Synthesizing it costs one window
    * over the key (fixture-only work: a real CDC source ships `before`
    * for free, so [[maintainAggView]]'s production cost starts at the
    * delta, not here). */
  def envelopeWithBefore(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("offset"))
    envelope(events).withColumn("before", lag(col("after"), 1).over(w))
  }

  /** The maintained aggregate view: `(event_type, cnt, sum_value, nnz)`
    * over the CURRENT table state (latest envelope per key in binlog
    * order; deleted keys absent). Decimal-exact sum so the incremental
    * and recomputed forms agree bit for bit under any association order.
    * `nnz` counts the group's non-null values — the extra counter that
    * makes SQL's sum-over-nulls semantics maintainable: `sum` is NULL
    * exactly when a group holds no non-null value, which a plain running
    * sum cannot know once deltas start cancelling. */
  def aggView(envelope: DataFrame): DataFrame =
    Relational.latestByKey(envelope, "key", col("offset"), col("offset"))
      .filter(col("op") =!= "d")
      .groupBy(col("after.event_type").as("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("after.value").cast("decimal(18,6)")).as("sum_value"),
        count(col("after.value")).as("nnz"))

  /** Incremental maintenance of [[aggView]] from a CDC delta — the
    * classic materialized-view delta rule (Gupta & Mumick, "Maintenance
    * of Materialized Views", IEEE DE Bulletin 1995) specialized to
    * count/sum over a keyed changelog: each delta envelope contributes
    * `+after` and `−before`, intermediate images telescope away, and the
    * merge touches only `|delta|` rows plus the (tiny) view itself — the
    * 100 TB fact table is NEVER rescanned.
    *
    * Correct for any split of the changelog: creates add `+after`,
    * updates add `+after − before` (group moves handled because the two
    * images carry their own group keys), deletes add `−before`,
    * delete-of-absent is a no-op (null before). Groups whose count
    * reaches zero leave the view. Shuffle shape: one delta-sized hash
    * aggregate on the group key, then a full-outer merge against the
    * view — broadcastable, since a maintained aggregate is orders of
    * magnitude smaller than its fact.
    *
    * `delta` must carry the `before` column ([[envelopeWithBefore]], or a
    * real Debezium stream's own) with `before` of the delta's first
    * envelope per key equal to the key's last pre-delta image. */
  def maintainAggView(base: DataFrame, delta: DataFrame): DataFrame = {
    val plus = delta.filter(col("after").isNotNull)
      .select(col("after.event_type").as("event_type"),
        lit(1L).as("dc"),
        coalesce(col("after.value").cast("decimal(18,6)"),
          lit(0).cast("decimal(18,6)")).as("dv"),
        col("after.value").isNotNull.cast("long").as("dn"))
    val minus = delta.filter(col("before").isNotNull)
      .select(col("before.event_type").as("event_type"),
        lit(-1L).as("dc"),
        (-coalesce(col("before.value").cast("decimal(18,6)"),
          lit(0).cast("decimal(18,6)"))).as("dv"),
        (-col("before.value").isNotNull.cast("long")).as("dn"))
    val deltaAgg = plus.unionByName(minus)
      .groupBy("event_type")
      .agg(sum(col("dc")).as("dc"), sum(col("dv")).as("dv"),
        sum(col("dn")).as("dn"))
    // null-SAFE merge key: a NULL group key is one group to groupBy (and
    // to the recompute/oracle), so it must be one group here too — a
    // null-unsafe join would leave base's and delta's null rows unmerged
    val b = base.alias("b")
    val d = deltaAgg.alias("d")
    val merged = b.join(d, col("b.event_type") <=> col("d.event_type"),
        "full_outer")
      .select(
        coalesce(col("b.event_type"), col("d.event_type")).as("event_type"),
        (coalesce(col("b.cnt"), lit(0L)) + coalesce(col("d.dc"), lit(0L)))
          .as("cnt"),
        (coalesce(col("b.sum_value"), lit(0).cast("decimal(18,6)")) +
          coalesce(col("d.dv"), lit(0).cast("decimal(18,6)"))).as("raw_sum"),
        (coalesce(col("b.nnz"), lit(0L)) + coalesce(col("d.dn"), lit(0L)))
          .as("nnz"))
    // SQL sum semantics: NULL (not 0) when the group holds no non-null
    // value — nnz is what makes that decidable incrementally
    merged
      .select(col("event_type"), col("cnt"),
        when(col("nnz") > 0, col("raw_sum")).as("sum_value"),
        col("nnz"))
      .filter(col("cnt") > 0)
  }
}
