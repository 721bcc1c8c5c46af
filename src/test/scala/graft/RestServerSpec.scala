package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.api.{Engine, ReferencePipeline, RestServer}
import graft.sources.Tables

/** The reference is driven entirely over REST (rest_example.sh) — this
  * spec drives the same loop: pipeline up, SHOW QUERIES, DESCRIBE, pull
  * query over HTTP, TERMINATE. */
class RestServerSpec extends GraftSuite {
  import spark.implicits._

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("REST facade: healthcheck, SHOW QUERIES, DESCRIBE, pull query, TERMINATE") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val engine = ReferencePipeline.start(
      new Engine(spark), in.toDF(), Tables.customer(spark, sf))
    val srv = new RestServer(engine).start()
    val port = srv.boundPort
    try {
      in.addData(Tables.events(spark, sf).as[Event].collect().toIndexedSeq)
      engine.processAllAvailable()

      assert(get(port, "/healthcheck").body().contains("\"isHealthy\":true"))
      assert(get(port, "/info").body().contains("\"runningQueries\":4"))

      val shown = post(port, "/ksql", """{"ksql":"SHOW QUERIES;"}""")
      assert(shown.statusCode() === 200)
      assert(shown.body().contains("ratings_per_customer_per_15minute"))
      assert(shown.body().contains("\"state\":\"RUNNING\""))

      val desc = post(port, "/ksql", """{"ksql":"DESCRIBE ratings_live;"}""")
      assert(desc.statusCode() === 200)
      assert(desc.body().contains("event_type"))

      // the reference's flagship pull query over HTTP
      // (readme.md:589-597 / ksqldb-statements.sql:104-110)
      val pulled = post(port, "/query",
        """{"sql":"SELECT full_name, ratings_count FROM ratings_per_customer_per_15minute WHERE window_start > TIMESTAMP '2024-01-01 00:00:00' LIMIT 5"}""")
      assert(pulled.statusCode() === 200)
      assert(pulled.body().startsWith("[") && pulled.body().contains("ratings_count"))

      val badSql = post(port, "/query", """{"sql":"SELECT FROM nope"}""")
      assert(badSql.statusCode() === 400)

      val term = post(port, "/ksql", """{"ksql":"TERMINATE ratings_live;"}""")
      assert(term.statusCode() === 200)
      assert(!post(port, "/ksql", """{"ksql":"SHOW QUERIES;"}""").body()
        .contains("\"name\":\"ratings_live\""))

      // DESCRIBE EXTENDED (the readme-documented form) and clean 400s
      val descExt = post(port, "/ksql",
        """{"ksql":"DESCRIBE EXTENDED ratings_with_customer_data;"}""")
      assert(descExt.statusCode() === 200 && descExt.body().contains("full_name"))
      assert(post(port, "/ksql", """{"ksql":"DESCRIBE no_such_table;"}""")
        .statusCode() === 400)
    } finally {
      srv.stop()
      engine.terminateAll()
    }
  }

  test("REST /ksql CREATE: the EP2 pipeline is creatable over HTTP alone") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.toDF().createOrReplaceTempView("ratings_src")
    Tables.customer(spark, sf).createOrReplaceTempView("customers_dim")
    val engine = new Engine(spark)
    val srv = new RestServer(engine).start()
    val port = srv.boundPort
    try {
      // CSAS chain — each statement derives from the registered source
      // views, mirroring rest_example.sh:40-51/80-99's DDL-over-HTTP flow.
      val live = post(port, "/ksql",
        """{"ksql":"CREATE STREAM rest_live AS SELECT * FROM ratings_src WHERE LCASE(event_type) NOT LIKE '%error%';"}""")
      assert(live.statusCode() === 200 && live.body().contains("SUCCESS"))
      val enriched = post(port, "/ksql",
        """{"ksql":"CREATE STREAM rest_enriched AS SELECT r.event_id, r.value, c.c_name AS full_name FROM ratings_src r JOIN customers_dim c ON r.user_id = c.c_custkey WHERE LCASE(r.event_type) NOT LIKE '%error%';"}""")
      assert(enriched.statusCode() === 200 && enriched.body().contains("SUCCESS"))
      val table = post(port, "/ksql",
        """{"ksql":"CREATE TABLE rest_counts WITH (KEYS='user_id') AS SELECT user_id, COUNT(*) AS n FROM ratings_src GROUP BY user_id;"}""")
      assert(table.statusCode() === 200 && table.body().contains("SUCCESS"))

      // CREATE TABLE without KEYS is a client error, not a 500
      assert(post(port, "/ksql",
        """{"ksql":"CREATE TABLE rest_bad AS SELECT user_id FROM ratings_src;"}""")
        .statusCode() === 400)
      // CREATE STREAM over a batch relation is a client error
      assert(post(port, "/ksql",
        """{"ksql":"CREATE STREAM rest_batch AS SELECT * FROM customers_dim;"}""")
        .statusCode() === 400)

      assert(get(port, "/info").body().contains("\"runningQueries\":3"))

      in.addData(Tables.events(spark, sf).as[Event].collect().toIndexedSeq)
      engine.processAllAvailable()

      // the HTTP-created pipeline serves pull queries over HTTP
      val pulled = post(port, "/query",
        """{"sql":"SELECT user_id, n FROM rest_counts ORDER BY n DESC LIMIT 5"}""")
      assert(pulled.statusCode() === 200 && pulled.body().contains("\"n\":"))
      val enrichedRows = post(port, "/query",
        """{"sql":"SELECT full_name, value FROM rest_enriched LIMIT 5"}""")
      assert(enrichedRows.statusCode() === 200 &&
        enrichedRows.body().contains("full_name"))

      // metadata surface: streams vs tables vs the whole catalog namespace
      val streams = post(port, "/ksql", """{"ksql":"SHOW STREAMS;"}""").body()
      assert(streams.contains("rest_live") && !streams.contains("rest_counts"))
      val tables = post(port, "/ksql", """{"ksql":"SHOW TABLES;"}""").body()
      assert(tables.contains("rest_counts") && !tables.contains("rest_live"))
      val topics = post(port, "/ksql", """{"ksql":"SHOW TOPICS;"}""").body()
      assert(topics.contains("ratings_src")) // source views are dataflows too

      // DROP terminates the query and removes the catalog view
      assert(post(port, "/ksql", """{"ksql":"DROP STREAM rest_live;"}""")
        .statusCode() === 200)
      assert(!post(port, "/ksql", """{"ksql":"SHOW QUERIES;"}""").body()
        .contains("rest_live"))
      assert(post(port, "/query", """{"sql":"SELECT * FROM rest_live"}""")
        .statusCode() === 400)
    } finally {
      srv.stop()
      engine.terminateAll()
    }
  }

  test("REST /query push: EMIT CHANGES streams NDJSON and self-terminates") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.toDF().createOrReplaceTempView("push_src")
    val engine = new Engine(spark)
    val srv = new RestServer(engine).start()
    val port = srv.boundPort
    try {
      in.addData(Tables.events(spark, sf).as[Event].collect().take(10).toIndexedSeq)
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:$port/query"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"sql":"SELECT event_id, event_type FROM push_src EMIT CHANGES LIMIT 3"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofInputStream())
      assert(resp.statusCode() === 200)
      assert(resp.headers().firstValue("Content-Type").orElse("")
        .contains("ndjson"))
      // Rows arrive over a LIVE chunked stream: read them line by line
      // while the continuous query is still serving the connection.
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(resp.body()))
      val lines = (1 to 3).map(_ => reader.readLine())
      assert(lines.forall(l => l != null && l.contains("\"event_id\"")))
      // LIMIT reached -> the query self-terminates and the stream closes.
      assert(reader.readLine() == null)

      // EMIT CHANGES over a batch relation is a clean client error
      Tables.customer(spark, sf).createOrReplaceTempView("push_batch_dim")
      assert(post(port, "/query",
        """{"sql":"SELECT * FROM push_batch_dim EMIT CHANGES LIMIT 1"}""")
        .statusCode() === 400)

      // an OPEN push stream must not block other endpoints (requests run
      // on a pool, not the dispatcher thread): hold a stream that cannot
      // reach its LIMIT and health-check through it, then disconnect
      val open = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:$port/query"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"sql":"SELECT event_id FROM push_src EMIT CHANGES LIMIT 500"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofInputStream())
      val held = new java.io.BufferedReader(
        new java.io.InputStreamReader(open.body()))
      assert(held.readLine() != null) // stream is live
      assert(get(port, "/healthcheck").statusCode() === 200)
      assert(get(port, "/info").statusCode() === 200)
      held.close() // client disconnect -> server stops the query
    } finally {
      srv.stop()
      engine.terminateAll()
    }
  }
}
