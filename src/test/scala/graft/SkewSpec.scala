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

  test("salted join equals the plain join as a row multiset") {
    import spark.implicits._
    // adversarial shape: one HOT fact key (the case salting exists for),
    // dim keys with multiple rows (join must fan out per replica exactly
    // once), and fact keys with no dim match (dropped by inner semantics)
    val fact = ((1 to 500).map(i => (i.toLong, 7L)) ++     // hot key 7
        Seq((501L, 1L), (502L, 2L), (503L, 99L)))          // 99: no match
      .toDF("row_id", "k")
    val dim = Seq((7L, "hot-a"), (7L, "hot-b"), (1L, "one"), (2L, "two"),
        (3L, "unreferenced"))
      .toDF("dk", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", col("row_id"),
        salts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .sorted.toSeq
    val plain = fact.join(dim, col("k") === col("dk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .sorted.toSeq
    assert(salted === plain, "salting changed the join's answer")
    assert(salted.count(_._2 == 7L) === 1000,
      "hot key must match both dim rows for every fact row")
    // the salt columns must not leak into the output schema
    assert(!Skew.saltedJoin(fact, dim, "k", "dk", col("row_id"))
      .columns.contains("__salt"))
  }

  test("salted join really spreads a hot key across salt partitions") {
    import spark.implicits._
    val fact = (1 to 256).map(i => (i.toLong, 7L)).toDF("row_id", "k")
    // the salt column takes >1 value over the hot key's rows, so the
    // (key, salt) shuffle cannot send them all to one reducer
    val nSalts = fact
      .withColumn("__salt", pmod(hash(col("row_id")), lit(16)))
      .select("__salt").distinct().count()
    assert(nSalts > 8, s"salt spread too narrow: $nSalts of 16 buckets")
  }
}
