package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends GraftSuite {

  private lazy val events = Tables.events(spark, sf)

  test("salted count equals single-phase groupBy count") {
    val salted = Skew.saltedCount(events, "user_id", col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted === plain)
  }

  test("salted collect_list equals single-phase as sorted multiset") {
    val salted = Skew.saltedCollectList(events, "user_id", "event_type",
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val plain = events.groupBy("user_id")
      .agg(sort_array(collect_list(col("event_type"))).as("values"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(salted === plain)
  }

  test("salted count-distinct equals countDistinct") {
    val salted = Skew.saltedCountDistinct(events, "user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = events.groupBy("user_id")
      .agg(countDistinct(col("event_type")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted === plain)
  }
}
