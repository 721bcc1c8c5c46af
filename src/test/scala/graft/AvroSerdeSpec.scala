package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.{AvroSerde, Streams}

class AvroSerdeSpec extends GraftSuite {

  test("events round-trip through Avro binary bit-for-bit") {
    val events = Tables.events(spark, sf).limit(200)
    val decoded = AvroSerde.decode(
      AvroSerde.encode(events, "rating"), Streams.eventSchema, "value",
      "rating")
    val before = events.collect().toSet
    val after = decoded.collect().toSet
    assert(after === before)
  }

  test("nullable fields and tombstone payloads decode to nulls") {
    import spark.implicits._
    val df = Seq((1L, Some("a"), Some(2.5)), (2L, None, None))
      .toDF("id", "s", "d")
    val encoded = AvroSerde.encode(df)
    // round-trip preserves nulls inside the record
    val back = AvroSerde.decode(encoded, df.schema).collect().toSet
    assert(back === Set(Row(1L, "a", 2.5), Row(2L, null, null)))
    // a null payload (Kafka tombstone) decodes to all-null fields
    val tomb = encoded.select(lit(null).cast("binary").as("value"))
    assert(AvroSerde.decode(tomb, df.schema).collect().toSet ===
      Set(Row(null, null, null)))
  }

  test("timestamps keep microsecond precision through the serde") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val df = Seq(Tuple1(ts)).toDF("t")
    val back = AvroSerde.decode(AvroSerde.encode(df), df.schema)
      .collect().head.getTimestamp(0)
    assert(back === ts)
  }

  test("passthrough columns (kafka key) survive encode and decode") {
    import spark.implicits._
    val df = Seq((10L, "k1", 1.0), (20L, "k2", 2.0)).toDF("id", "key", "v")
    val enc = AvroSerde.encode(df, passthrough = Seq("key"))
    assert(enc.columns.toSeq === Seq("key", "value"))
    val dec = AvroSerde.decode(enc,
      org.apache.spark.sql.types.StructType(
        df.schema.fields.filter(_.name != "key")), "value")
    assert(dec.columns.toSeq === Seq("key", "id", "v"))
    assert(dec.collect().toSet === Set(Row("k1", 10L, 1.0), Row("k2", 20L, 2.0)))
  }

  test("flagship pipeline runs over Avro-decoded events (streaming)") {
    // MemoryStream of Avro-encoded payloads → decode → live filter →
    // enrichment — the reference's VALUE_FORMAT='AVRO' path end-to-end.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables.events(spark, sf).limit(100)
    val payloads = AvroSerde.encode(events, "rating")
      .collect().map(_.getAs[Array[Byte]]("value"))
    val stream = MemoryStream[Array[Byte]]
    stream.addData(payloads.toSeq)
    val decoded = AvroSerde.decode(
      stream.toDF().withColumnRenamed("value", "value"),
      Streams.eventSchema, "value", "rating")
    val enriched = Streams.enrichedStream(
      Streams.liveEvents(decoded), Tables.customer(spark, sf))
    val q = enriched.writeStream.format("memory")
      .queryName("avro_enriched").outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = spark.table("avro_enriched").count()
      val expected = graft.operators.Relational.enriched(
        graft.operators.Relational.eventsLive(events),
        Tables.customer(spark, sf)).count()
      assert(n === expected)
      assert(n > 0)
    } finally q.stop()
  }
}
