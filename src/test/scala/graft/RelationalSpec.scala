package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

class RelationalSpec extends GraftSuite {

  test("entry (flagship enrichment) returns rows with expected schema") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet === Set("rating_id", "message", "stars", "channel",
      "customer_id", "full_name", "club_status"))
    assert(df.count() > 0)
  }

  test("hopping windows: every event lands in exactly size/slide windows") {
    val ev = Tables.events(spark, sf)
    val hop = Relational.hoppingCountsByType(ev, sizeSec = 900, slideSec = 300)
    // counts across overlapping windows triple-count each event
    val total = hop.agg(sum(col("events_count"))).collect()(0).getLong(0)
    assert(total === ev.count() * 3)
    // window starts are epoch-aligned to the slide, not the size
    val misaligned = hop
      .filter(expr("unix_timestamp(window_start) % 300 != 0"))
      .count()
    assert(misaligned === 0)
    // strictly more windows than the tumbling form of the same size
    val tumbling = ev.groupBy(window(col("ts"), "900 seconds")).count().count()
    assert(hop.select("window_start").distinct().count() > tumbling)
  }

  test("live/error filters partition the events stream") {
    val ev = Tables.events(spark, sf)
    val live = Relational.eventsLive(ev).count()
    val err = Relational.eventsError(ev).count()
    assert(live + err === ev.count())
    assert(live > 0 && err > 0)
  }

  test("enrichment join drops events with no matching customer") {
    val ev = Relational.eventsLive(Tables.events(spark, sf))
    val cust = Tables.customer(spark, sf)
    val out = Relational.enriched(ev, cust)
    assert(out.filter(col("full_name").isNull).count() === 0)
    // every output row corresponds to a live event with a known customer
    val expected = ev.join(cust,
      ev("user_id") === cust("c_custkey"), "inner").count()
    assert(out.count() === expected)
  }

  test("unhappy platinum is a subset of enriched with the filter applied") {
    val ev = Relational.eventsLive(Tables.events(spark, sf))
    val out = Relational.unhappyPlatinum(
      Relational.enriched(ev, Tables.customer(spark, sf)))
    assert(out.filter(col("stars") >= 3 || col("club_status") =!= "BUILDING")
      .count() === 0)
  }

  test("q1_agg groups are complete and counts add up") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val totalCnt = rows.map(_.getAs[Long]("cnt")).sum
    assert(totalCnt === Tables.lineitem(spark, sf).count())
  }

  test("latestByKey keeps exactly one row per key, the max-ordering one") {
    val ev = Tables.events(spark, sf)
    val latest = Relational.latestByKey(ev, "user_id",
      col("ts"), col("event_id"))
    val keys = ev.select("user_id").distinct().count()
    assert(latest.count() === keys)
    // the kept ts per key is the max ts per key
    val maxTs = ev.groupBy("user_id").agg(max("ts").as("mts"))
    val joined = latest.join(maxTs, "user_id")
      .filter(col("ts") =!= col("mts")).count()
    assert(joined === 0)
  }
}
