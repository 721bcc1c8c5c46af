package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal REST facade over [[Engine]] — the reference drives ksqlDB
  * entirely over its REST API (`/root/reference/rest_example.sh:30-99`
  * POSTs `{"ksql": ...}` to `/ksql` and pull queries to `/query`;
  * `readme.md` uses the CLI against the same endpoints). SURVEY §2.10
  * originally declared REST out of scope; this closes the row with the
  * JDK's built-in `com.sun.net.httpserver` — zero added dependencies.
  *
  * Endpoints (shape mirrors ksqlDB's, simplified payloads):
  *  - `GET  /healthcheck`      → `{"isHealthy":true}`
  *  - `GET  /info`             → engine + query-count info
  *  - `POST /ksql`             → admin statements: `SHOW QUERIES;`,
  *    `DESCRIBE <name>;`, `TERMINATE <name>;` in `{"ksql":"..."}`
  *  - `POST /query`            → pull query: `{"sql":"SELECT ..."}`,
  *    returns a JSON array of row objects (driver-side result of a
  *    point-in-time lookup — pull queries are bounded by contract;
  *    `maxRows` caps the response regardless)
  *
  * The server is a serving-layer veneer: every data path goes through the
  * same [[Engine]]/Catalyst plans as the Scala API — no second query
  * engine. Scale note: pull-query serving at production rate belongs on a
  * compacted store (see [[graft.streaming.Streams.toUpsertTable]]); this
  * endpoint executes the lookup per request, which is the ksqlDB contract
  * for `/query`.
  */
class RestServer(engine: Engine, port: Int = 0, maxRows: Int = 1000) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  /** Bound port (useful when constructed with port 0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String,
                      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def jstr(s: String): String = graft.functions.Json.quote(s)

  /** Extract `"key": "value"` from a (flat, trusted-test-scale) JSON body —
    * enough for the `{"ksql": "..."}` / `{"sql": "..."}` payload shapes the
    * reference's examples use, without pulling in a JSON dependency.
    * Unescaping is a single left-to-right pass: sequential `replace` calls
    * corrupt inputs like `\\n` (escaped backslash + literal n) into a
    * newline. */
  private def jsonField(body: String, key: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"")
      .matcher(body)
    if (!m.find()) None
    else {
      val raw = m.group(1)
      val sb = new StringBuilder(raw.length)
      var i = 0
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (c == '\\' && i + 1 < raw.length) {
          raw.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'u' if i + 5 < raw.length =>
              sb.append(Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case other => sb.append(other); i += 2 // \" \\ \/ etc.
          }
        } else { sb.append(c); i += 1 }
      }
      Some(sb.toString)
    }
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  server.createContext("/healthcheck", (ex: HttpExchange) =>
    respond(ex, 200, """{"isHealthy":true}"""))

  server.createContext("/info", (ex: HttpExchange) =>
    respond(ex, 200,
      s"""{"engine":"graft","runningQueries":${engine.showQueries.size}}"""))

  server.createContext("/ksql", (ex: HttpExchange) => {
    val stmt = jsonField(readBody(ex), "ksql").getOrElse("").trim
      .stripSuffix(";").trim
    val upper = stmt.toUpperCase
    try {
      if (upper == "SHOW QUERIES") {
        val qs = engine.showQueries.map { case (n, active) =>
          s"""{"name":${jstr(n)},"state":${jstr(if (active) "RUNNING" else "STOPPED")}}"""
        }.mkString("[", ",", "]")
        respond(ex, 200, s"""{"queries":$qs}""")
      } else if (upper.startsWith("DESCRIBE ")) {
        val name = stmt.substring("DESCRIBE ".length).trim
        respond(ex, 200, s"""{"name":${jstr(name)},"schema":${jstr(engine.describe(name))}}""")
      } else if (upper.startsWith("TERMINATE ")) {
        val name = stmt.substring("TERMINATE ".length).trim
        engine.terminate(name)
        respond(ex, 200, s"""{"terminated":${jstr(name)}}""")
      } else {
        respond(ex, 400,
          s"""{"error":"unsupported statement","statement":${jstr(stmt)}}""")
      }
    } catch {
      case e: Exception =>
        respond(ex, 500, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""")
    }
  })

  server.createContext("/query", (ex: HttpExchange) => {
    val body = readBody(ex) // read once — the request stream is consumable
    val sql = jsonField(body, "sql").orElse(jsonField(body, "ksql")).getOrElse("")
    try {
      val rows = engine.pullQuery(sql).limit(maxRows).toJSON.collect()
      respond(ex, 200, rows.mkString("[", ",", "]"))
    } catch {
      case e: Exception =>
        respond(ex, 400, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""")
    }
  })

  def start(): RestServer = { server.start(); this }

  def stop(): Unit = server.stop(0)
}
