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

  test("Confluent wire format: 5-byte header round-trips, wrong magic rejected") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val enc = AvroSerde.encode(df, confluentSchemaId = Some(42))
    // header bytes: magic 0x00 then the schema id big-endian
    val bytes = enc.collect().map(_.getAs[Array[Byte]]("value"))
    assert(bytes.forall(b => b(0) == 0x00 &&
      b(1) == 0 && b(2) == 0 && b(3) == 0 && b(4) == 42))
    val back = AvroSerde.decode(enc, df.schema, confluentSchemaId = Some(42))
    assert(back.collect().toSet === Set(Row(1L, "a"), Row(2L, "b")))
    // header-less payloads must be rejected, not mis-parsed as Avro data
    val headerless = AvroSerde.encode(df)
    val err = intercept[org.apache.spark.SparkException] {
      AvroSerde.decode(headerless, df.schema, confluentSchemaId = Some(42))
        .collect()
    }
    assert(err.getMessage.contains("magic") ||
      Option(err.getCause).exists(_.getMessage.contains("magic")))
    // a registry id other than the expected one is rejected too
    val wrongId = intercept[org.apache.spark.SparkException] {
      AvroSerde.decode(enc, df.schema, confluentSchemaId = Some(7)).collect()
    }
    assert(wrongId.getMessage.contains("schema id") ||
      Option(wrongId.getCause).exists(_.getMessage.contains("schema id")))
  }

  test("registry decode: one topic, two schema versions, resolved by header id") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // v1 writers knew (id, s); v2 added a nullable double `v`. The topic
    // interleaves payloads from both writer generations.
    val v1Struct = StructType(Seq(StructField("id", LongType, false),
      StructField("s", StringType, true)))
    val v2Struct = StructType(Seq(StructField("id", LongType, false),
      StructField("s", StringType, true),
      StructField("v", DoubleType, true)))
    // build each generation's frame under its EXACT declared schema — the
    // registry must hold what the writers actually registered (a nullable
    // field is an Avro union, a different wire shape than a bare double)
    val v1Df = spark.createDataFrame(
      java.util.List.of(Row(1L, "a"), Row(2L, "b")), v1Struct)
    val v2Df = spark.createDataFrame(
      java.util.List.of(Row(3L, "c", java.lang.Double.valueOf(3.5))), v2Struct)
    val v1Rows = AvroSerde.encode(v1Df, confluentSchemaId = Some(1))
    val v2Rows = AvroSerde.encode(v2Df, confluentSchemaId = Some(2))
    val topic = v1Rows.union(v2Rows)
    val registry = graft.streaming.MapSchemaRegistry(Map(
      1 -> AvroSerde.avroSchemaFor(v1Struct).toString,
      2 -> AvroSerde.avroSchemaFor(v2Struct).toString))
    // reading the mixed topic at the v2 (reader) schema: v1 records fill
    // the added field from its null default — Avro schema resolution, not
    // a guess
    val decoded = AvroSerde.decodeWithRegistry(topic, v2Struct, registry)
    assert(decoded.collect().toSet === Set(
      Row(1L, "a", null), Row(2L, "b", null), Row(3L, "c", 3.5)))
    // an id the registry cannot resolve is a hard failure naming the id
    val unknown = AvroSerde.encode(
      Seq((9L, "z")).toDF("id", "s"), confluentSchemaId = Some(99))
    val err = intercept[org.apache.spark.SparkException] {
      AvroSerde.decodeWithRegistry(unknown, v2Struct, registry).collect()
    }
    assert(err.getMessage.contains("99") ||
      Option(err.getCause).exists(_.getMessage.contains("99")))
    // header-less payloads hard-fail too: a registry decode must never
    // guess the writer schema
    val bare = AvroSerde.encode(Seq((9L, "z")).toDF("id", "s"))
    val noHeader = intercept[org.apache.spark.SparkException] {
      AvroSerde.decodeWithRegistry(bare, v2Struct, registry).collect()
    }
    assert(noHeader.getMessage.contains("header") ||
      Option(noHeader.getCause).exists(_.getMessage.contains("header")))
  }

  test("Avro-illegal Spark column names are sanitized; collisions fail fast") {
    import spark.implicits._
    // hyphens and leading digits are legal in Spark, illegal in Avro
    val df = Seq((1L, "x")).toDF("my-col", "2nd field")
    val back = AvroSerde.decode(AvroSerde.encode(df), df.schema)
    assert(back.columns.toSeq === Seq("my-col", "2nd field")) // Spark names kept
    assert(back.collect().toSet === Set(Row(1L, "x")))
    // two names collapsing to the same sanitized field is an error, not
    // a silent alias
    val clash = Seq((1L, 2L)).toDF("a-b", "a_b")
    val err = intercept[IllegalArgumentException](AvroSerde.encode(clash))
    assert(err.getMessage.contains("a-b") && err.getMessage.contains("a_b"))
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

  test("sparkSchemaFor inverts avroSchemaFor (incl. unions and timestamps)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("ts", TimestampType, nullable = false),
      StructField("score", DoubleType, nullable = true),
      StructField("flags", IntegerType, nullable = false),
      StructField("blob", BinaryType, nullable = true)))
    val back = AvroSerde.sparkSchemaFor(
      AvroSerde.avroSchemaFor(schema, "roundtrip").toString)
    assert(back === schema)
    // latestFor: subject → latest (id, schema); unknown subject → None
    val reg = graft.streaming.MapSchemaRegistry(
      Map(5 -> AvroSerde.avroSchemaFor(schema).toString),
      subjects = Map("t-value" -> 5))
    assert(reg.latestFor("t-value").map(_._1) === Some(5))
    assert(reg.latestFor("absent-value") === None)
  }
}
