package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sinks.{EsSink, FileBulkTransport}

class EsSinkSpec extends GraftSuite {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("bulk lines: keyed mode sets _id (idempotent upsert), auto mode omits it") {
    val df = Seq((1L, "alice"), (2L, "bo\"b")).toDF("id", "name")
    val keyed = EsSink.bulkLines(df, "ratings", Some("id")).collect()
    assert(keyed.forall(_.startsWith("""{"index":{"_index":"ratings","_id":""")))
    val auto = EsSink.bulkLines(df, "enriched", None).collect()
    assert(auto.forall(_.startsWith("""{"index":{"_index":"enriched"}}""" + "\n")))
    // doc payload is valid JSON with escaping intact
    assert(auto.exists(_.contains("""bo\"b""")))
  }

  test("*_TS and timestamp columns render as ISO-8601 dates (index template rule)") {
    val df = Seq((1L, Timestamp.valueOf("2024-03-01 12:30:45.5")))
      .toDF("id", "RATING_TS")
    val line = EsSink.bulkLines(df, "idx", None).collect().head
    assert(line.contains(""""RATING_TS":"2024-03-01T12:30:45.500Z""""))
  }

  test("timestamp rendering asserts the true UTC instant on a non-UTC session") {
    // the shared test session pins UTC, which used to mask a bug where the
    // rendered string carried a literal 'Z' but session-zone wall-clock
    // digits; force a -05:00 session and check the INSTANT is preserved
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ts = Timestamp.valueOf("2024-01-15 12:00:00") // JVM-zone wall clock
      val expected = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ts.getTime))
      val df = Seq((1L, ts)).toDF("id", "RATING_TS")
      val line = EsSink.bulkLines(df, "idx", None).collect().head
      assert(line.contains(s""""RATING_TS":"$expected""""),
        s"expected instant $expected in: $line")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("EXTRACT_TS injection mirrors the InsertField SMT") {
    val df = Seq((1L, Timestamp.valueOf("2024-03-01 00:00:00")))
      .toDF("id", "ts")
    val out = EsSink.withExtractTs(df, eventTime = Some("ts"))
    assert(out.columns.contains("EXTRACT_TS"))
    val line = EsSink.bulkLines(out, "idx", None).collect().head
    assert(line.contains(""""EXTRACT_TS":"2024-03-01T00:00:00.000Z""""))
  }

  test("keyed bulk replay is idempotent under a tiny ES model") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val lines = EsSink.bulkLines(df, "idx", Some("id")).collect()
    // apply the same bulk twice to a map keyed by _id — upsert semantics
    val index = scala.collection.mutable.Map[String, String]()
    (lines ++ lines).foreach { entry =>
      val Array(action, doc) = entry.split("\n", 2)
      val id = action.split(""""_id":"""")(1).takeWhile(_ != '"')
      index(id) = doc
    }
    assert(index.size === 2)
  }

  // ------------------------------------------------------------------ //
  // CDC DELETE propagation — Kafka-Connect `behavior.on.null.values`
  // (round-7 verdict item 2): a tombstone (null value column) must be able
  // to DELETE its doc from the index, not linger forever.
  // ------------------------------------------------------------------ //

  /** Tiny ES model: apply bulk entries in order — `index` actions upsert
    * by `_id`, `delete` actions remove the `_id`. ES deletes are
    * idempotent (deleting a missing doc is a per-item 404, not an error),
    * which the plain `remove` mirrors. */
  private def applyBulk(index: scala.collection.mutable.Map[String, String],
                        entries: Seq[String]): Unit =
    entries.foreach { entry =>
      val parts = entry.split("\n", 2)
      val id = parts(0).split(""""_id":"""")(1).takeWhile(_ != '"')
      if (parts(0).startsWith("""{"delete"""")) index.remove(id)
      else index(id) = parts(1)
    }

  private def cdcBatch(rows: (String, Option[String], String)*) =
    rows.toSeq.toDF("key", "after", "op")

  test("behavior.on.null.values: ignore skips tombstones, delete emits a " +
    "bulk delete action, fail raises") {
    val df = cdcBatch(("1", Some("alice"), "c"), ("2", None, "d"))
    val ign = EsSink.bulkLines(df, "customers", Some("key"),
      Some("after"), "ignore").collect()
    assert(ign.length === 1 && ign.head.contains(""""_id":"1""""))

    val del = EsSink.bulkLines(df, "customers", Some("key"),
      Some("after"), "delete").collect()
    assert(del.length === 2)
    val delLine = del.find(_.startsWith("""{"delete"""")).get
    assert(delLine === """{"delete":{"_index":"customers","_id":"2"}}""")
    assert(!delLine.contains("\n"), "a delete action carries no source doc")

    val ex = intercept[Throwable] {
      EsSink.bulkLines(df, "customers", Some("key"),
        Some("after"), "fail").collect()
    }
    val messages = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("tombstone"), s"unexpected failure: $messages")

    // Connect rejects delete mode without a record key (key.ignore=true):
    // there is no _id to delete by
    intercept[IllegalArgumentException] {
      EsSink.bulkLines(df, "customers", None, Some("after"), "delete")
    }
  }

  test("a key deleted upstream disappears from the index and replaying the " +
    "microbatch is a no-op") {
    val b1 = cdcBatch(("1", Some("alice"), "c"), ("2", Some("bob"), "c"))
    val b2 = cdcBatch(("2", None, "d"), ("1", Some("alicia"), "u"))
    def lines(b: org.apache.spark.sql.DataFrame) =
      EsSink.bulkLines(b, "customers", Some("key"), Some("after"), "delete")
        .collect().toSeq
    val index = scala.collection.mutable.Map[String, String]()
    applyBulk(index, lines(b1))
    assert(index.keySet === Set("1", "2"))
    applyBulk(index, lines(b2))
    assert(index.keySet === Set("1"), "deleted key must leave the index")
    assert(index("1").contains("alicia"))
    // checkpoint replay (at-least-once): re-applying the same microbatch
    // must converge to the same index — upserts overwrite, deletes 404
    val before = index.toMap
    applyBulk(index, lines(b2))
    assert(index.toMap === before, "replay must be a no-op")
  }

  test("streaming CDC sink with delete behavior spools delete actions for " +
    "tombstoned keys") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("es-del-spool")
    val ckpt = tmpDir("es-del-ckpt")
    val in = MemoryStream[(String, Option[String], String)]
    val q = EsSink.writeStream(
      in.toDF().toDF("key", "after", "op"), "customers", Some("key"), ckpt,
      new FileBulkTransport(dir), Some("after"), "delete")
    in.addData(("7", Some("grace"), "c"))
    q.processAllAvailable()
    in.addData(("7", Option.empty[String], "d"))
    q.processAllAvailable(); q.stop()
    val spooled = Files.list(Paths.get(dir)).iterator().asScala
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    assert(spooled.exists(_.startsWith(
      """{"index":{"_index":"customers","_id":"7"""")))
    assert(spooled.contains("""{"delete":{"_index":"customers","_id":"7"}}"""))
  }

  test("streaming foreachBatch sink spools bulk files per microbatch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("es-spool")
    val ckpt = tmpDir("es-ckpt")
    val in = MemoryStream[Event]
    val q = EsSink.writeStream(
      EsSink.withExtractTs(in.toDF(), eventTime = Some("ts")),
      "ratings", Some("event_id"), ckpt, new FileBulkTransport(dir))
    in.addData(Event(1, Timestamp.valueOf("2024-01-01 00:00:01"), 1, "click", 4.0, "{}"))
    q.processAllAvailable()
    in.addData(Event(2, Timestamp.valueOf("2024-01-01 00:00:02"), 2, "view", 2.0, "{}"))
    q.processAllAvailable(); q.stop()

    val lines = Files.list(Paths.get(dir)).iterator().asScala
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    assert(lines.count(_.contains(""""_id"""")) === 2)
    assert(lines.count(_.contains(""""EXTRACT_TS"""")) === 2)
  }
}
