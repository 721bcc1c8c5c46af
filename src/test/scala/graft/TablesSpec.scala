package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.sources.Tables

/** Fixture-loading invariants. The driver has regenerated the fixtures
  * with different physical timestamp types across rounds (TIMESTAMP(NANOS)
  * → naive timestamp[us], which Spark reads as TIMESTAMP_NTZ); every
  * oracle query downstream assumes `Tables.load` normalizes whatever era
  * is on disk to session-zoned TimestampType under UTC. A type drift here
  * broke 7 queries at the top of round 6 — this locks the contract. */
class TablesSpec extends GraftSuite {

  test("timestamp columns normalize to session-zoned TimestampType") {
    for ((table, cols) <- Seq("events" -> Seq("ts"),
        "lineitem" -> Seq("l_shipdate"), "orders" -> Seq("o_orderdate"));
        c <- cols) {
      val dt = Tables.load(spark, sf, table).schema(c).dataType
      assert(dt == TimestampType,
        s"$table.$c must load as TimestampType (session-zoned), got $dt")
    }
  }

  test("epoch math agrees with the oracle's naive-as-UTC view") {
    // unix_millis must be defined (it rejects TIMESTAMP_NTZ) and the
    // session zone pinned to UTC, so wall-clock '1996-01-01 00:00:00' in
    // the fixture is exactly the UTC epoch DuckDB computes for it.
    val row = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("ts"))
      .limit(1).collect().head
    assert(row.get(0) != null)
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    val roundTrip = spark.range(1)
      .select(timestamp_micros(lit(row.getLong(0))).as("t"))
      .collect().head.getTimestamp(0)
    assert(roundTrip == row.getTimestamp(1),
      "unix_micros/timestamp_micros must round-trip under the UTC zone")
  }

  test("nanos-era long columns still convert (era back-compat)") {
    // Simulate the TIMESTAMP(NANOS)-era read: nano-longs written raw.
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos").toString
    val nanos = 1704067200000000000L // 2024-01-01 00:00:00 UTC
    spark.range(1).select(lit(nanos).as("ts"),
        lit(1L).as("event_id"), lit(1L).as("user_id"),
        lit("click").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(unix_millis(col("ts"))).collect().head.getLong(0)
    assert(got == 1704067200000L, s"nano-long must convert losslessly, got $got")
  }
}
