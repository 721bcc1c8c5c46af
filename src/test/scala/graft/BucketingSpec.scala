package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Co-located joins via bucketing: the write-once-shuffle-never pattern for
  * repeatedly-joined big tables. */
class BucketingSpec extends GraftSuite {

  test("bucketed-bucketed equi-join plans without a shuffle exchange") {
    val events = Tables.events(spark, sf)
    Tables.writeBucketed(events.select("event_id", "user_id", "value"),
      "ev_bucketed", 8, "user_id")
    Tables.writeBucketed(
      events.groupBy("user_id").agg(count(lit(1)).as("n_events")),
      "user_stats_bucketed", 8, "user_id")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_bucketed")
        .join(spark.table("user_stats_bucketed"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free co-located join, got:\n$plan")
      // and it still computes the right thing
      assert(joined.count() === spark.table("ev_bucketed").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS user_stats_bucketed")
    }
  }

  test("date-partitioned layout prunes partitions at the scan") {
    // the 100 TB layout: facts land date-partitioned, so a one-day query
    // must list ONE partition directory, not scan the table. Lock the
    // PartitionFilters plan property on a partitioned copy of events.
    val dir = java.nio.file.Files.createTempDirectory("graft-part")
      .resolve("events").toString
    val events = Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
    events.write.partitionBy("event_date").parquet(dir)
    val someDay = events.select(to_date(col("ts")).cast("string"))
      .first().getString(0)
    val q = spark.read.parquet(dir)
      .filter(col("event_date") === someDay)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_date"),
      s"date filter must prune partitions, not scan them:\n$plan")
    // the pruned read returns exactly that day's rows
    val expected = events.filter(to_date(col("ts")) === someDay).count()
    assert(q.agg(sum("n")).first().getLong(0) === expected)
  }
}
