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
    } finally {
      srv.stop()
      engine.terminateAll()
    }
  }
}
