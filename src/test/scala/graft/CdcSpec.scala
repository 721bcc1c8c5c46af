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
}
