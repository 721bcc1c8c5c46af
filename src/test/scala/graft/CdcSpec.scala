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
}
