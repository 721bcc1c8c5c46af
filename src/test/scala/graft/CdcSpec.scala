package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc
import graft.sources.Tables

class CdcSpec extends GraftSuite {

  private lazy val env = Cdc.envelope(Tables.events(spark, sf))

  test("envelope: deletes are tombstones (null after-image), others carry the row") {
    assert(env.filter(col("op") === "d" && col("after").isNotNull).count() === 0)
    assert(env.filter(col("op") =!= "d" && col("after").isNull).count() === 0)
  }

  test("unwrap drops tombstones and flattens the after-image") {
    val out = Cdc.unwrap(env)
    assert(out.columns.toSeq ===
      Seq("id", "user_id", "event_type", "value", "props", "op", "ts_ms"))
    assert(out.filter(col("op") === "d").count() === 0)
    assert(out.count() === env.filter(col("op") =!= "d").count())
  }

  test("table view: one row per surviving key; deleted-latest keys disappear") {
    val table = Cdc.latestByKeyTable(env)
    assert(table.groupBy("user_id").count().filter(col("count") > 1).count() === 0)
    // keys whose latest envelope is a delete must be absent
    val latest = graft.operators.Relational
      .latestByKey(env, "key", col("ts_ms"), col("offset"))
    val deletedKeys = latest.filter(col("op") === "d").select("key")
    val present = table.select(col("user_id").cast("string").as("key"))
    assert(present.join(deletedKeys, "key").count() === 0)
    assert(table.count() === latest.filter(col("op") =!= "d").count())
  }

  test("SCD2 history: gapless intervals, current rows = the live snapshot") {
    val hist = Cdc.scd2History(env).cache()
    // intervals never overlap and only the key's LAST version may be
    // open-ended (a delete may close an interval EARLY — before the next
    // create — so chains may have gaps, but never overlaps)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("valid_from"), col("id"))
    val overlapping = hist
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        (col("valid_to").isNull || col("valid_to") > col("next_from")))
    assert(overlapping.count() === 0,
      "validity intervals must be closed and non-overlapping except the last")
    // at most one current version per key, and the set of current rows
    // must be EXACTLY the latest-table snapshot (same keys + values)
    assert(hist.filter(col("is_current") === 1)
      .groupBy("key").count().filter(col("count") > 1).count() === 0)
    val current = hist.filter(col("is_current") === 1)
      .select(col("id"), col("user_id"), col("event_type"), col("value"))
    val snapshot = Cdc.latestByKeyTable(env)
      .select(col("id"), col("user_id"), col("event_type"), col("value"))
    assert(current.exceptAll(snapshot).count() === 0 &&
      snapshot.exceptAll(current).count() === 0,
      "current SCD2 rows must equal the latest-by-key table")
    hist.unpersist()
  }

  test("envelopeWithBefore: before is the key's previous after-image in binlog order") {
    val envB = Cdc.envelopeWithBefore(Tables.events(spark, sf))
    val rows = envB
      .select(col("key"), col("offset"), col("after.id").as("after_id"),
        col("before.id").as("before_id"))
      .collect()
      .groupBy(_.getString(0))
    rows.values.foreach { keyRows =>
      val ordered = keyRows.sortBy(_.getLong(1))
      // first envelope per key has no before
      assert(ordered.head.isNullAt(3))
      ordered.sliding(2).foreach {
        case Array(prev, cur) =>
          val prevAfter = if (prev.isNullAt(2)) null else prev.get(2)
          val curBefore = if (cur.isNullAt(3)) null else cur.get(3)
          assert(curBefore === prevAfter,
            s"before must be the previous envelope's after (key ${cur.getString(0)})")
        case _ => ()
      }
    }
  }

  test("maintainAggView equals a full recompute for ANY changelog split") {
    val envB = Cdc.envelopeWithBefore(Tables.events(spark, sf)).cache()
    try {
      def snap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getDecimal(2).stripTrailingZeros,
          r.getLong(3))).sortBy(_._1).toSeq
      val want = snap(Cdc.aggView(envB))
      val maxOff = envB.agg(max(col("offset"))).head().getLong(0)
      // split points: everything-in-base, everything-in-delta, and two
      // interior cuts — the maintained view must be split-invariant
      Seq(-1L, maxOff / 3, maxOff * 3 / 5, maxOff).foreach { s =>
        val got = snap(Cdc.maintainAggView(
            Cdc.aggView(envB.filter(col("offset") <= s)),
            envB.filter(col("offset") > s)))
        assert(got === want, s"split at offset $s diverged from recompute")
      }
    } finally { envB.unpersist(); () }
  }

  test("maintainAggView: group moves, deletes, and emptied groups") {
    import spark.implicits._
    def img(t: String, v: Double) =
      struct(lit(0L).as("id"), lit(0L).as("user_id"), lit(t).as("event_type"),
        lit(v).as("value"), lit("").as("props"))
    // base view: A has one row (1.5), B has one row (2.0)
    val base = Seq(("A", 1L, BigDecimal("1.500000"), 1L),
        ("B", 1L, BigDecimal("2.000000"), 1L))
      .toDF("event_type", "cnt", "sum_value", "nnz")
      .select(col("event_type"), col("cnt"),
        col("sum_value").cast("decimal(18,6)").as("sum_value"), col("nnz"))
    // delta: the A row MOVES to group C (update changes the group key);
    // the B row is deleted → group B must leave the view
    val delta = Seq(1, 2).toDF("i").select(
      when(col("i") === 1, img("C", 7.25)).as("after"),
      when(col("i") === 1, img("A", 1.5)).otherwise(img("B", 2.0)).as("before"))
    val got = Cdc.maintainAggView(base, delta)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).sortBy(_._1).toSeq
    assert(got === Seq(("C", 1L, 7.25)),
      "A must empty out, B must be deleted, C must appear with the moved row")
  }

  test("maintainAggView: NULL group keys merge; all-null groups sum to NULL") {
    // Round-10 review findings: (1) a null-unsafe merge key left base's
    // and delta's NULL-group rows unmerged; (2) coalescing a NULL sum to
    // 0 diverged from SQL's sum-over-nulls. Build a changelog where both
    // cases are live (the events fixture has no NULLs) and assert the
    // maintained view equals the recompute at every split.
    import spark.implicits._
    def env(offset: Long, key: String, op: String,
            typ: Option[String], v: Option[Double]) =
      (key, op, offset, typ, v)
    val rows = Seq(
      env(1, "k1", "c", None, Some(1.0)),       // NULL group key, value 1
      env(2, "k2", "c", None, Some(2.0)),       // NULL group key, value 2
      env(3, "k3", "c", Some("A"), None),       // group A, NULL value
      env(4, "k4", "c", Some("A"), None),       // group A, NULL value
      env(5, "k5", "c", Some("B"), Some(5.0)),
      env(6, "k2", "u", None, Some(2.5)),       // update inside NULL group
      env(7, "k5", "u", Some("B"), None),       // B's only value goes NULL
      env(8, "k1", "d", None, None))            // delete from NULL group
    val envDf = rows.toDF("key", "op", "offset", "typ", "v")
      .select(col("key"),
        when(col("op") =!= "d",
          struct(col("offset").as("id"), lit(0L).as("user_id"),
            col("typ").as("event_type"), col("v").as("value"),
            lit("").as("props"))).as("after"),
        col("op"), col("offset").as("ts_ms"), col("offset"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("offset"))
    val envB = envDf.withColumn("before", lag(col("after"), 1).over(w))
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (
        if (r.isNullAt(0)) null else r.getString(0),
        r.getLong(1),
        if (r.isNullAt(2)) null else r.getDecimal(2).stripTrailingZeros,
        r.getLong(3)))
        .sortBy(t => Option(t._1).getOrElse("")).toSeq
    val want = snap(Cdc.aggView(envB))
    // the recompute itself must show the two hazards are live in the
    // fixture: a NULL-key group, and groups with cnt > 0 but NULL sum
    assert(want.exists(_._1 == null), "fixture must have a NULL group key")
    assert(want.exists(t => t._3 == null && t._2 > 0),
      "fixture must have an all-null-valued group (sum NULL, cnt > 0)")
    (0L to 8L).foreach { s =>
      val got = snap(Cdc.maintainAggView(
          Cdc.aggView(envB.filter(col("offset") <= s)),
          envB.filter(col("offset") > s)))
      assert(got === want, s"split at offset $s diverged from recompute")
    }
  }
}
