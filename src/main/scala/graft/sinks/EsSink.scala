package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.TimestampType

/** Elasticsearch sink shape — the reference's Kafka-Connect ES sink
  * connectors re-expressed as `foreachBatch` bulk writers.
  *
  * The reference runs two connector configs:
  *  - `sink-elastic-ratings`: `key.ignore=false` → doc `_id` = record key,
  *    i.e. idempotent upsert (`/root/reference/commands.sql:1-11`, K2), plus
  *    an `InsertField` SMT injecting the record timestamp as `RATING_TS`
  *    (T3).
  *  - `sink-elastic-01`: multi-topic, `key.ignore=true` → auto `_id`
  *    (append-only), `EXTRACT_TS` injection, `errors.tolerance=all` +
  *    `behavior.on.malformed.documents=warn` — log and skip bad docs
  *    (`ksqldb-statements.sql:70-85`, K3).
  * The ES index template types any `*_TS` field as `date`
  * (`docker-compose.yml:295-300`, K4) — honored here by rendering `*_TS`
  * (and all timestamp) columns as ISO-8601 strings in the emitted JSON.
  *
  * Doc construction is pure Catalyst (`to_json(struct(...))`,
  * whole-stage-codegen'd, correct JSON escaping); only the transport is
  * driver-pluggable. Exactly-once to ES: checkpointing gives at-least-once
  * per microbatch, and `_id`-keyed upserts make the replay idempotent — the
  * same delivery contract as the reference's Connect + `key.ignore=false`
  * path (SURVEY §4).
  */
object EsSink {

  /** T3 — `InsertField$Value` timestamp SMT: inject the processing-time
    * extraction timestamp. The reference uses the Kafka record timestamp;
    * pass `eventTime` to mirror that, otherwise wall-clock. */
  def withExtractTs(df: DataFrame, name: String = "EXTRACT_TS",
                    eventTime: Option[String] = None): DataFrame =
    df.withColumn(name,
      eventTime.map(col).getOrElse(current_timestamp()))

  /** K4 — render every timestamp-typed or `*_TS`-named column as ISO-8601
    * with millis (the `strict_date_optional_time` shape ES's dynamic `date`
    * mapping expects). Formats the INSTANT directly with a UTC-pinned
    * formatter (`DateFormatClass(_, _, Some("UTC"))`): `date_format` alone
    * renders session-zone wall clock under a literal 'Z', and the
    * `to_utc_timestamp(ts, current_timezone())` round-trip is wrong inside
    * DST transitions (the wall-clock reinterpretation resolves spring-
    * forward gap times an hour off). The analyzer preserves an explicit
    * timeZoneId, so this is session-zone-independent and DST-proof. */
  def renderTimestamps(df: DataFrame): DataFrame = {
    def utcIso(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.DateFormatClass(
          org.apache.spark.sql.GraftColumnBridge.expression(c.cast("timestamp")),
          org.apache.spark.sql.GraftColumnBridge.expression(
            lit("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")),
          Some("UTC")))
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType == TimestampType || f.name.toUpperCase.endsWith("_TS"))
        acc.withColumn(f.name, utcIso(col(f.name)))
      else acc
    }
  }

  /** One `_bulk` entry (action line + newline + source doc) per row.
    * `idCol = Some(key)` is the `key.ignore=false` mode (doc `_id` = key →
    * idempotent upsert); `None` is `key.ignore=true` (auto `_id`,
    * append-only). Malformed rows (null docs) are dropped, mirroring
    * `behavior.on.malformed.documents=warn` + `errors.tolerance=all`.
    *
    * TOMBSTONES (Kafka-Connect `behavior.on.null.values`, round-7 verdict
    * item 2): a Connect record with a null VALUE is a tombstone; in this
    * engine's flattened topics the value-nullness is carried by a marker
    * column (`tombstoneCol` — for Debezium-enveloped topics that is the
    * `after` image, null exactly when the upstream row was deleted).
    *  - `onNull = "ignore"` (the Connect ES sink default): tombstones are
    *    skipped — the index keeps the last-written doc forever.
    *  - `onNull = "delete"`: tombstones emit a `{"delete":{"_index":…,
    *    "_id":…}}` action (no source line), so a CDC'd row deleted
    *    upstream disappears from the index. Requires `idCol` (Connect
    *    likewise rejects delete mode with `key.ignore=true` — there is no
    *    id to delete by). ES deletes by `_id` are idempotent (a replayed
    *    microbatch re-deletes a missing doc → 404-per-item, not an
    *    error), so checkpoint-replay semantics are unchanged.
    *  - `onNull = "fail"`: a tombstone fails the batch (Connect's FAIL).
    * With `tombstoneCol = None` (default) no tombstone concept applies and
    * every row renders as a doc — the pre-round-8 behavior, used by all
    * non-CDC sinks. When a tombstone marker IS configured it is control
    * metadata, not payload: the marker column is excluded from the
    * rendered doc (Connect's unwrap output doesn't re-nest the value
    * either). A tombstone whose KEY is also null is malformed — there is
    * no `_id` to delete by — and is dropped like other malformed rows
    * (emitting an id-less delete action would 400 the whole `_bulk`
    * request and wedge the sink on checkpoint replay). */
  def bulkLines(df: DataFrame, index: String,
                idCol: Option[String] = None,
                tombstoneCol: Option[String] = None,
                onNull: String = "ignore"): Dataset[String] = {
    import df.sparkSession.implicits._
    require(Set("ignore", "delete", "fail").contains(onNull),
      s"behavior.on.null.values must be ignore|delete|fail, got '$onNull'")
    require(tombstoneCol.isEmpty || onNull != "delete" || idCol.nonEmpty,
      "behavior.on.null.values=delete needs a doc id (key.ignore=false)")
    val rendered = renderTimestamps(df)
    val action = idCol match {
      // to_json of a nested struct emits the exact bulk action line with
      // correct JSON escaping of the id value
      case Some(k) => to_json(struct(
        struct(lit(index).as("_index"),
          col(k).cast("string").as("_id")).as("index")))
      case None => lit(s"""{"index":{"_index":"$index"}}""")
    }
    val docCols = rendered.columns.toIndexedSeq
      .filterNot(tombstoneCol.contains)
    val docEntry = concat(action, lit("\n"),
      to_json(struct(docCols.map(col): _*)))
    val entry = tombstoneCol match {
      case None => docEntry
      case Some(tc) => onNull match {
        case "ignore" => when(col(tc).isNotNull, docEntry)
        case "delete" =>
          val del = to_json(struct(
            struct(lit(index).as("_index"),
              col(idCol.get).cast("string").as("_id")).as("delete")))
          when(col(tc).isNull && col(idCol.get).isNotNull, del)
            .when(col(tc).isNull, lit(null)) // null-key tombstone: drop
            .otherwise(docEntry)
        case "fail" =>
          // raise_error inside the codegen'd projection: the first
          // tombstone in any partition fails the (micro)batch, which the
          // checkpoint then retries — Connect's FAIL stops the task the
          // same way.
          when(col(tc).isNull, raise_error(concat(
            lit(s"tombstone for index '$index' with behavior.on.null.values=fail, key="),
            coalesce(col(idCol.getOrElse(tc)).cast("string"), lit("<null>")))))
            .otherwise(docEntry)
      }
    }
    rendered
      .select(entry.as("line"))
      .filter(col("line").isNotNull)
      .as[String]
  }

  /** Streaming ES sink: per microbatch, build bulk lines and hand each
    * partition to `transport` (an HTTP `_bulk` POST in production; the test
    * transport appends to local files). Per-partition batching bounds the
    * bulk-request size; a failed partition fails the microbatch and is
    * retried from the checkpoint — at-least-once, idempotent when
    * `idCol` is set. */
  def writeStream(df: DataFrame, index: String, idCol: Option[String],
                  checkpoint: String, transport: BulkTransport,
                  tombstoneCol: Option[String] = None,
                  onNull: String = "ignore",
                  orderCol: Option[String] = None): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, index, idCol, transport, tombstoneCol, onNull,
          orderCol); ()
      }
      .start()

  /** Batch form of the sink (also the `foreachBatch` body).
    *
    * PER-KEY ORDERING under delete mode: Kafka-Connect gets it from topic
    * partitioning by key — every action for a key flows through one task
    * in offset order. A Spark microbatch has no such guarantee: a create
    * and a delete of the same key can land in DIFFERENT partitions, whose
    * `_bulk` POSTs race, and the wrong winner resurrects (or falsely
    * removes) the doc forever. With `orderCol` set (the topic's event
    * order — CDC `ts_ms`, Kafka record timestamp), delete-mode batches
    * first reduce to latest-action-per-key ([[graft.operators.Relational
    * .latestByKey]] — one shuffle on the key), after which at most ONE
    * action per key exists per microbatch and cross-partition order is
    * moot; microbatches themselves are sequential. Without an order
    * column the reduction is impossible (Spark rows carry no implicit
    * order) — callers must guarantee per-key-single-partition batches. */
  def writeBatch(batch: DataFrame, index: String, idCol: Option[String],
                 transport: BulkTransport,
                 tombstoneCol: Option[String] = None,
                 onNull: String = "ignore",
                 orderCol: Option[String] = None): Unit = {
    val effective = (idCol, orderCol) match {
      case (Some(id), Some(ord))
          if onNull == "delete" && tombstoneCol.nonEmpty =>
        // tie-break equal order values with the topic's total order when
        // it exists (CDC envelopes carry the binlog `offset`) — Connect
        // never ties because partition offsets are total; we shouldn't
        // pick arbitrarily either
        val ordering = Seq(col(ord)) ++
          (if (batch.columns.contains("offset")) Seq(col("offset")) else Nil)
        // null-key rows are outside the reduction: Window.partitionBy
        // groups all nulls together and latest-per-key would silently
        // collapse N malformed auto-id docs into one — they keep their
        // pre-reduction behavior (each renders/drops per the action rules)
        graft.operators.Relational
          .latestByKey(batch.filter(col(id).isNotNull), id, ordering: _*)
          .unionByName(batch.filter(col(id).isNull))
      case _ => batch
    }
    bulkLines(effective, index, idCol, tombstoneCol, onNull).foreachPartition {
      (lines: Iterator[String]) => transport.send(lines)
    }
  }
}

/** Transport for `_bulk` payload chunks. Production: HTTP POST to
  * `/_bulk` with error-tolerant response parsing. Tests: append to a local
  * spool directory. Must be Serializable (runs on executors). */
trait BulkTransport extends Serializable {
  def send(lines: Iterator[String]): Unit
}

/** Test/local transport: appends each partition's bulk payload to a
  * uniquely-named file under `dir` — the "index" is inspectable as NDJSON. */
class FileBulkTransport(dir: String) extends BulkTransport {
  def send(lines: Iterator[String]): Unit = {
    val chunk = lines.mkString("\n")
    if (chunk.nonEmpty) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val f = java.nio.file.Paths.get(dir,
        s"bulk-${java.util.UUID.randomUUID()}.ndjson")
      java.nio.file.Files.writeString(f, chunk + "\n")
    }
  }
}

/** Production transport: POST each partition's entries to
  * `<connectionUrl>/_bulk` — the wire the reference's connectors actually
  * use (`connection.url = http://elasticsearch:9200`,
  * `commands.sql:1-11`). Runs on executors (Serializable; the HttpClient
  * is a JVM-wide singleton in the companion — each deserialized task
  * copy shares the executor's one client, keeping connection reuse and
  * avoiding per-task selector threads; JDK 17's HttpClient has no
  * `close()`, so per-instance clients would accumulate until GC).
  *
  *  - **Bounded requests**: entries accumulate up to `maxBytes` per POST
  *    (ES's `http.max_content_length` defaults to 100 MB; Connect's
  *    default batch is far smaller) — a skewed partition can't build a
  *    gigabyte body.
  *  - **Backpressure retry**: 429 (`es_rejected_execution`) and 5xx get
  *    exponential backoff up to `maxRetries`, then fail the task — Spark
  *    retries the partition from the checkpoint, preserving
  *    at-least-once; `_id`-keyed docs make the replay idempotent.
  *  - **Item errors** (`"errors":true` in the `_bulk` response):
  *    `tolerant = true` counts and skips them —
  *    `behavior.on.malformed.documents = warn` + `errors.tolerance=all`,
  *    the reference's multi-topic sink config
  *    (`ksqldb-statements.sql:80-84`); `false` throws with the response
  *    head, failing the batch (Connect's FAIL default).
  *
  * NOT exercised against a real Elasticsearch in this container (none
  * exists — documented gap, README); the spec drives it against a local
  * stub `/_bulk` server asserting the request shape (NDJSON + trailing
  * newline, content-type), chunking, retry, and both error modes. */
class HttpBulkTransport(connectionUrl: String, tolerant: Boolean = false,
                        maxBytes: Int = 4 * 1024 * 1024, maxRetries: Int = 3)
    extends BulkTransport {
  private def client = HttpBulkTransport.client

  override def send(lines: Iterator[String]): Unit = {
    val buf = new StringBuilder
    lines.foreach { entry =>
      if (buf.nonEmpty && buf.length + entry.length + 1 > maxBytes) flush(buf)
      buf.append(entry).append('\n')
    }
    flush(buf)
  }

  private def flush(buf: StringBuilder): Unit = {
    if (buf.isEmpty) return
    val body = buf.toString; buf.clear()
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(s"$connectionUrl/_bulk"))
      .header("Content-Type", "application/x-ndjson")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    var attempt = 0
    var done = false
    while (!done) {
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val code = resp.statusCode()
      if (code == 429 || code >= 500) {
        attempt += 1
        if (attempt > maxRetries)
          throw new java.io.IOException(
            s"_bulk failed after $maxRetries retries: HTTP $code")
        Thread.sleep(100L << (attempt - 1)) // 100/200/400ms backoff
      } else if (code >= 400) {
        throw new java.io.IOException(
          s"_bulk rejected: HTTP $code ${resp.body().take(500)}")
      } else {
        // per-item errors: the response envelope flags "errors":true and
        // carries an "error" object inside each failed item
        if (resp.body().contains(""""errors":true""")) {
          if (!tolerant)
            throw new java.io.IOException(
              s"_bulk item errors: ${resp.body().take(500)}")
          // warn-and-skip (errors.tolerance=all): the failed docs are
          // dropped; successful items in the same request stand
          System.err.println(
            s"[EsSink] tolerated _bulk item errors: ${resp.body().take(200)}")
        }
        done = true
      }
    }
  }
}

object HttpBulkTransport {
  /** One HttpClient per JVM, shared by every transport instance and task
    * deserialization — connection keep-alive works across microbatches
    * and no selector threads leak (see class scaladoc). */
  private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newHttpClient()
}
