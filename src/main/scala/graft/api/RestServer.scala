package graft.api

import java.net.{InetAddress, InetSocketAddress}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.AnalysisException

import graft.streaming.Streams

/** REST facade over [[Engine]] — the reference drives ksqlDB entirely over
  * its REST API (`/root/reference/rest_example.sh:30-99` POSTs
  * `{"ksql": ...}` DDL — including `CREATE STREAM ... AS SELECT` — to
  * `/ksql`, and queries to `/query`; `readme.md` uses the CLI against the
  * same endpoints). Built on the JDK's `com.sun.net.httpserver` — zero
  * added dependencies.
  *
  * Endpoints (shape mirrors ksqlDB's, simplified payloads):
  *  - `GET  /healthcheck`      → `{"isHealthy":true}`
  *  - `GET  /info`             → engine + query-count info
  *  - `POST /ksql`             → admin + DDL statements in `{"ksql":"..."}`:
  *    `SHOW QUERIES|STREAMS|TABLES|TOPICS|CONNECTORS;`,
  *    `DESCRIBE [EXTENDED] <name>;`, `TERMINATE <name>;`, `DROP
  *    STREAM|TABLE|CONNECTOR <name>;`, `SET '...' = '...';`,
  *    `CREATE STREAM <name> AS SELECT ...` (the SELECT runs via `spark.sql`
  *    over registered views — rest_example.sh:40-51's pipeline-creation
  *    path), `CREATE TABLE <name> WITH (KEYS='k1,k2'[, DIR='...'])
  *    AS SELECT ...` (update-mode upsert materialization, the windowed-table
  *    path of rest_example.sh:80-99), declaration forms `CREATE
  *    STREAM|TABLE <name> [(cols)] WITH (KAFKA_TOPIC='t', ...)` over an
  *    existing topic, and the reference's connector DDL `CREATE
  *    SOURCE|SINK CONNECTOR <name> WITH ('k'='v', ...)`
  *    (ksqldb-statements.sql:1-11,19-38,70-85 replay verbatim —
  *    [[Engine.createSinkConnector]]/[[Engine.createSourceConnector]]),
  *    and the erasure maintenance statements over the engine's
  *    registered targets — `RETIRE DOCS (ids) FROM GUARD <name>;`
  *    (guard forgets the docs' fingerprints/bands:
  *    [[Engine.retireDocs]]), `UNRETIRE DOCS (ids) FROM GUARD
  *    <name>;` (the crash-replay hatch the ingest fail-fast names:
  *    [[Engine.unretireDocs]]), `DELETE VECTORS (ids) FROM INDEX
  *    <name>;` ([[Engine.deleteVectors]] — masked immediately),
  *    `COMPACT INDEX <name>;` ([[Engine.compactIvfIndex]] — physical
  *    purge) and `COMPACT GUARD <name>;` ([[Engine.compactGuardStore]]
  *    — probe-layout restore). Statements against a store whose owning query is still
  *    RUNNING are refused with a 400 naming the query to TERMINATE —
  *    the single-writer contract enforced, not documented.
  *  - `/connectors`            → the Kafka-Connect REST analog on the same
  *    registry (`rest_example.sh:13,56,102` hits Connect directly on
  *    :8083): `POST /connectors` `{"name","config"}` → 201,
  *    `PUT /connectors/<name>/config` (bare config object, upsert) →
  *    200/201, `GET /connectors`, `GET /connectors/<name>[/config|/status]`,
  *    `DELETE /connectors/<name>` → 204.
  *  - `POST /query`            → `{"sql":"..."}`. A bare SELECT is a pull
  *    query: point-in-time result as one JSON array, `maxRows`-capped. A
  *    `SELECT ... EMIT CHANGES [LIMIT n]` is a PUSH query: rows stream back
  *    as chunked NDJSON while the continuous query runs, terminating at the
  *    LIMIT (ksqlDB's `EMIT CHANGES LIMIT` contract,
  *    `/root/reference/commands.sql:24-25`) or client disconnect.
  *
  * The server is a serving-layer veneer: every data path goes through the
  * same [[Engine]]/Catalyst plans as the Scala API — no second query
  * engine. Binds the LOOPBACK interface by default — `/query` executes
  * arbitrary SQL against the session catalog, so anything wider than
  * localhost must be an explicit `bindAddress` opt-in (the reference's
  * listener address is likewise configuration, docker-compose.yml). Scale
  * note: pull-query serving at production rate belongs on a compacted
  * store (see [[graft.streaming.Streams.toUpsertTable]]); this endpoint
  * executes the lookup per request, which is the ksqlDB contract for
  * `/query`.
  */
class RestServer(engine: Engine, port: Int = 0, maxRows: Int = 1000,
                 bindAddress: InetAddress = InetAddress.getLoopbackAddress) {

  private val server =
    HttpServer.create(new InetSocketAddress(bindAddress, port), 0)
  // Without an explicit executor every request runs serially on the
  // dispatcher thread — one long pull (or an open push stream) would block
  // /healthcheck and everything else. Cached pool: idle threads reap.
  server.setExecutor(Executors.newCachedThreadPool())

  private val pushNames = new AtomicLong()
  private val instanceTag = RestServer.instanceIds.incrementAndGet()

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

  /** 400 for statement/catalog errors the caller can fix; 500 otherwise. */
  private def errorResponse(ex: HttpExchange, e: Exception): Unit = {
    val code = e match {
      case _: AnalysisException | _: IllegalArgumentException => 400
      case _ => 500
    }
    respond(ex, code, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""")
  }

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
    if (m.find()) Some(unescapeJson(m.group(1))) else None
  }

  private def unescapeJson(raw: String): String = {
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
    sb.toString
  }

  // every `"key": "value"` pair in a (flat) JSON object — the shape of a
  // Kafka-Connect config map, where all values are strings
  private val stringPairRe = java.util.regex.Pattern.compile(
    "\"((?:[^\"\\\\]|\\\\.)+)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"")

  /** Parse a flat JSON object of string→string pairs (a Connect config).
    * Non-string values (nested objects, numbers) don't match and are
    * skipped — Connect configs are all-string by contract. */
  private def jsonStringPairs(body: String): Map[String, String] = {
    val m = stringPairRe.matcher(body)
    val b = Map.newBuilder[String, String]
    while (m.find()) b += unescapeJson(m.group(1)) -> unescapeJson(m.group(2))
    b.result()
  }

  /** Slice the `"config": { ... }` object out of a `POST /connectors` body
    * by brace-matching (config values are strings, so the first balanced
    * close brace ends the object; braces inside quoted values are skipped
    * by tracking the in-string state). */
  private def configSlice(body: String): Option[String] = {
    val km = java.util.regex.Pattern.compile("\"config\"\\s*:\\s*\\{")
      .matcher(body)
    if (!km.find()) None
    else {
      val start = km.end() - 1 // at the '{'
      var i = start
      var depth = 0
      var inString = false
      while (i < body.length) {
        val c = body.charAt(i)
        if (inString) {
          if (c == '\\') i += 1 // skip the escaped char
          else if (c == '"') inString = false
        } else c match {
          case '"' => inString = true
          case '{' => depth += 1
          case '}' =>
            depth -= 1
            if (depth == 0) return Some(body.substring(start, i + 1))
          case _ =>
        }
        i += 1
      }
      None // unbalanced — caller reports the 400
    }
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  // `CREATE STREAM|TABLE <name> [WITH (...)] AS SELECT ...`
  private val createRe = java.util.regex.Pattern.compile(
    "(?is)^CREATE\\s+(STREAM|TABLE)\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*" +
      "(?:WITH\\s*\\(([^)]*)\\)\\s*)?AS\\s+(SELECT\\b.*)$")
  private val propRe = java.util.regex.Pattern.compile(
    "(?i)([A-Za-z_]+)\\s*=\\s*'([^']*)'")
  // `CREATE SOURCE|SINK CONNECTOR <name> WITH ('k'='v', ...)` — the
  // reference's connector DDL (ksqldb-statements.sql:1-11,19-38,70-85)
  private val connectorRe = java.util.regex.Pattern.compile(
    "(?is)^CREATE\\s+(SOURCE|SINK)\\s+CONNECTOR\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*" +
      "WITH\\s*\\((.*)\\)$")
  // connector props: quoted, case-sensitive, dotted keys
  // ('connector.class' = '...', 'transforms.ExtractTimestamp.type' = '...')
  private val connPropRe = java.util.regex.Pattern.compile(
    "'([^']+)'\\s*=\\s*'([^']*)'")
  // `CREATE STREAM|TABLE <name> [(col specs)] WITH (KAFKA_TOPIC='t', ...)`
  // — source DECLARATION over an existing topic, no AS SELECT
  // (commands.sql:13, ksqldb-statements.sql:42-46)
  private val declRe = java.util.regex.Pattern.compile(
    "(?is)^CREATE\\s+(STREAM|TABLE)\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*" +
      "(?:\\(([^)]*)\\)\\s*)?WITH\\s*\\(([^)]*)\\)$")
  private val primaryKeyRe = java.util.regex.Pattern.compile(
    "(?i)([A-Za-z_][A-Za-z0-9_]*)[^,()]*\\bPRIMARY\\s+KEY")
  // `... EMIT CHANGES [LIMIT n]` suffix → push query
  private val emitRe = java.util.regex.Pattern.compile(
    "(?is)^(.*?)\\s+EMIT\\s+CHANGES(?:\\s+LIMIT\\s+(\\d+))?\\s*$")
  // `PRINT ['"]<topic>['"] [FROM BEGINNING] [INTERVAL n] [LIMIT n]` — the
  // reference CLI's first inspection step (readme.md:70,266). FROM
  // BEGINNING is accepted as written: the registered streaming topics here
  // replay from their start within the process (offset choice is a
  // source-registration option — Streams.kafkaEvents startingOffsets);
  // INTERVAL (print every nth message) is accepted and ignored.
  private val printRe = java.util.regex.Pattern.compile(
    "(?is)^PRINT\\s+['\"]?([A-Za-z_][A-Za-z0-9_.\\-]*)['\"]?" +
      "(?:\\s+FROM\\s+BEGINNING)?(?:\\s+INTERVAL\\s+\\d+)?" +
      "(?:\\s+LIMIT\\s+(\\d+))?\\s*$")

  // `INSERT INTO <topic> (c1, c2, ...) VALUES (v1, v2, ...)` — the
  // reference demo's "make changes in MySQL" step (readme.md:302-312)
  // replayed against a file-backed source-connector topic
  private val insertRe = java.util.regex.Pattern.compile(
    "(?is)^INSERT\\s+INTO\\s+['\"]?([A-Za-z_][A-Za-z0-9_.\\-]*)['\"]?" +
      "\\s*\\(([^)]*)\\)\\s*VALUES\\s*\\((.*)\\)\\s*$")

  // erasure maintenance statements (r17 verdict Next #3): the engine's
  // registered erasure targets driven the reference's way — statements
  // over REST beside the connector DDL, not a JVM deploy. Single-writer
  // refusal (owning query still RUNNING) comes back as a 400 naming the
  // query to TERMINATE.
  //   RETIRE DOCS (1, 2, 3) FROM GUARD <name>
  //   DELETE VECTORS (1, 2, 3) FROM INDEX <name>
  //   COMPACT INDEX <name>
  // target-name charset matches insertRe's topic charset (dots/dashes
  // included): registerGuardStore/registerIvfIndex accept arbitrary
  // names, and a registered name the statement grammar cannot spell
  // would be unreachable over REST with only a generic 400 as the clue
  private val retireRe = java.util.regex.Pattern.compile(
    "(?is)^RETIRE\\s+DOCS\\s*\\(([^)]*)\\)\\s+FROM\\s+GUARD\\s+" +
      "['\"]?([A-Za-z_][A-Za-z0-9_.\\-]*)['\"]?\\s*$")
  // UNRETIRE DOCS (ids) FROM GUARD <name> — the ingest fail-fast's
  // documented remedy must be executable over the same surface that
  // operates everything else, or the crash-replay runbook ends in "now
  // deploy a JVM" (Engine.unretireDocs)
  private val unretireRe = java.util.regex.Pattern.compile(
    "(?is)^UNRETIRE\\s+DOCS\\s*\\(([^)]*)\\)\\s+FROM\\s+GUARD\\s+" +
      "['\"]?([A-Za-z_][A-Za-z0-9_.\\-]*)['\"]?\\s*$")
  private val delVecRe = java.util.regex.Pattern.compile(
    "(?is)^DELETE\\s+VECTORS\\s*\\(([^)]*)\\)\\s+FROM\\s+INDEX\\s+" +
      "['\"]?([A-Za-z_][A-Za-z0-9_.\\-]*)['\"]?\\s*$")
  private val compactRe = java.util.regex.Pattern.compile(
    "(?is)^COMPACT\\s+INDEX\\s+['\"]?([A-Za-z_][A-Za-z0-9_.\\-]*)['\"]?\\s*$")
  // COMPACT GUARD <name> — the guard stores' maintenance twin of
  // COMPACT INDEX (fp + band stores have no in-loop compaction the way
  // upsert tables' compactEvery does; Engine.compactGuardStore)
  private val compactGuardRe = java.util.regex.Pattern.compile(
    "(?is)^COMPACT\\s+GUARD\\s+['\"]?([A-Za-z_][A-Za-z0-9_.\\-]*)['\"]?\\s*$")

  private def parseIdList(raw: String): Seq[Long] = {
    val ids = raw.split(",").map(_.trim).filter(_.nonEmpty)
    require(ids.nonEmpty, "empty id list")
    ids.map(s => java.lang.Long.parseLong(s)).toIndexedSeq
  }

  /** Parse a VALUES list: 'single-quoted strings' (with '' escapes),
    * integers, decimals, NULL. Commas inside quotes stay in the value. */
  private def parseValues(raw: String): Seq[Any] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = raw.length
    while (i < n) {
      while (i < n && (raw(i) == ' ' || raw(i) == ',')) i += 1
      if (i < n) {
        if (raw(i) == '\'') {
          val sb = new StringBuilder
          i += 1
          var done = false
          while (!done && i < n) {
            if (raw(i) == '\'' && i + 1 < n && raw(i + 1) == '\'') {
              sb.append('\''); i += 2
            } else if (raw(i) == '\'') { i += 1; done = true }
            else { sb.append(raw(i)); i += 1 }
          }
          out += sb.toString
        } else {
          val start = i
          while (i < n && raw(i) != ',') i += 1
          val tok = raw.substring(start, i).trim
          out += (if (tok.equalsIgnoreCase("NULL")) null
                  else if (tok.matches("[+-]?\\d+")) tok.toLong
                  else tok.toDouble)
        }
      }
    }
    out.toSeq
  }

  private def withProps(raw: String): Map[String, String] = {
    val m = propRe.matcher(raw)
    val b = Map.newBuilder[String, String]
    while (m.find()) b += m.group(1).toUpperCase -> m.group(2)
    b.result()
  }

  server.createContext("/healthcheck", (ex: HttpExchange) =>
    respond(ex, 200, """{"isHealthy":true}"""))

  server.createContext("/info", (ex: HttpExchange) =>
    respond(ex, 200,
      s"""{"engine":"graft","runningQueries":${engine.showQueries.size}}"""))

  // ------------------------------------------------------------------- //
  // Kafka-Connect REST analog — the reference ALSO drives connectors
  // through Connect's own API on :8083 (`rest_example.sh:13-24` POST
  // /connectors with {"name","config"}, `:56-70` PUT
  // /connectors/register-mysql/config with a bare config object, `:102-133`
  // the multi-topic ES sink). Same registry as the `/ksql`
  // CREATE SOURCE|SINK CONNECTOR path — this is routing, not a second
  // implementation. Response shapes follow Connect's contract: 201 +
  // connector info on create, 200 on config replace, 204 on delete,
  // GET /connectors → name array, GET <name>/status → state tree.
  // ------------------------------------------------------------------- //

  private def connectorJson(name: String, kind: String, tasks: Seq[String],
                            config: Map[String, String]): String = {
    val cfg = config.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val ts = tasks.indices
      .map(i => s"""{"connector":${jstr(name)},"task":$i}""")
      .mkString("[", ",", "]")
    s"""{"name":${jstr(name)},"config":$cfg,"tasks":$ts,""" +
      s""""type":${jstr(kind.toLowerCase)}}"""
  }

  server.createContext("/connectors", (ex: HttpExchange) => {
    val segments = ex.getRequestURI.getPath.stripPrefix("/connectors")
      .split("/").filter(_.nonEmpty).toList
    try {
      (ex.getRequestMethod, segments) match {
        case ("GET", Nil) =>
          respond(ex, 200, engine.showConnectors.map(c => jstr(c._1))
            .mkString("[", ",", "]"))
        case ("POST", Nil) =>
          val body = readBody(ex)
          val name = jsonField(body, "name").getOrElse(
            throw new IllegalArgumentException(
              """POST /connectors requires a "name" field"""))
          val config = configSlice(body).map(jsonStringPairs).getOrElse(
            throw new IllegalArgumentException(
              """POST /connectors requires a "config" object"""))
          val (kind, tasks) = engine.createConnector(name, config)
          respond(ex, 201, connectorJson(name, kind, tasks, config))
        case ("GET", name :: Nil) =>
          engine.connectorInfo(name) match {
            case Some((kind, tasks, config)) =>
              respond(ex, 200, connectorJson(name, kind, tasks, config))
            case None => respond(ex, 404,
              s"""{"error":${jstr(s"connector $name not found")}}""")
          }
        case ("DELETE", name :: Nil) =>
          if (engine.connectorInfo(name).isDefined) {
            engine.dropConnector(name)
            ex.sendResponseHeaders(204, -1) // Connect: empty 204 on delete
            ex.getResponseBody.close()
          } else respond(ex, 404,
            s"""{"error":${jstr(s"connector $name not found")}}""")
        case ("GET", name :: "config" :: Nil) =>
          engine.connectorInfo(name) match {
            case Some((_, _, config)) =>
              respond(ex, 200, config.toSeq.sortBy(_._1)
                .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
                .mkString("{", ",", "}"))
            case None => respond(ex, 404,
              s"""{"error":${jstr(s"connector $name not found")}}""")
          }
        case ("PUT", name :: "config" :: Nil) =>
          val config = jsonStringPairs(readBody(ex))
          require(config.nonEmpty,
            s"PUT /connectors/$name/config: empty or non-JSON config body")
          val (created, kind, tasks) = engine.putConnector(name, config)
          respond(ex, if (created) 201 else 200,
            connectorJson(name, kind, tasks, config))
        case ("GET", name :: "status" :: Nil) =>
          engine.connectorInfo(name) match {
            case Some((kind, tasks, _)) =>
              // SINK tasks are streaming queries (state from the engine's
              // ledger); SOURCE tasks are registered topics, RUNNING by
              // construction (the file-stream source is passive until read)
              val active = engine.showQueries.toMap
              val worker = jstr(s"graft:${boundPort}")
              val ts = tasks.zipWithIndex.map { case (t, i) =>
                val state =
                  if (kind == "SOURCE" || active.getOrElse(t, false)) "RUNNING"
                  else "STOPPED"
                s"""{"id":$i,"state":${jstr(state)},"worker_id":$worker}"""
              }.mkString("[", ",", "]")
              respond(ex, 200,
                s"""{"name":${jstr(name)},"connector":{"state":"RUNNING",""" +
                  s""""worker_id":$worker},"tasks":$ts,""" +
                  s""""type":${jstr(kind.toLowerCase)}}""")
            case None => respond(ex, 404,
              s"""{"error":${jstr(s"connector $name not found")}}""")
          }
        case (method, path) =>
          respond(ex, 404, s"""{"error":"no route for $method """ +
            s"""/connectors/${path.mkString("/")}"}""")
      }
    } catch {
      case e: Exception => errorResponse(ex, e)
    }
  })

  server.createContext("/ksql", (ex: HttpExchange) => {
    val stmt = jsonField(readBody(ex), "ksql").getOrElse("").trim
      .stripSuffix(";").trim
    val upper = stmt.toUpperCase
    val create = createRe.matcher(stmt)
    val connector = connectorRe.matcher(stmt)
    val decl = declRe.matcher(stmt)
    val print = printRe.matcher(stmt)
    val insert = insertRe.matcher(stmt)
    val retire = retireRe.matcher(stmt)
    val unretire = unretireRe.matcher(stmt)
    val delVec = delVecRe.matcher(stmt)
    val compact = compactRe.matcher(stmt)
    val compactGuard = compactGuardRe.matcher(stmt)
    try {
      if (retire.matches()) {
        val name = retire.group(2)
        val applied = engine.retireDocs(name, parseIdList(retire.group(1)))
        respond(ex, 200, s"""{"status":"SUCCESS","guard":${jstr(name)},""" +
          s""""retired":$applied}""")
      } else if (unretire.matches()) {
        val name = unretire.group(2)
        val removed =
          engine.unretireDocs(name, parseIdList(unretire.group(1)))
        respond(ex, 200, s"""{"status":"SUCCESS","guard":${jstr(name)},""" +
          s""""unretired":$removed}""")
      } else if (delVec.matches()) {
        val name = delVec.group(2)
        val total = engine.deleteVectors(name, parseIdList(delVec.group(1)))
        respond(ex, 200, s"""{"status":"SUCCESS","index":${jstr(name)},""" +
          s""""n_tombstones":$total}""")
      } else if (compact.matches()) {
        val name = compact.group(1)
        engine.compactIvfIndex(name)
        respond(ex, 200,
          s"""{"status":"SUCCESS","compacted":${jstr(name)}}""")
      } else if (compactGuard.matches()) {
        val name = compactGuard.group(1)
        engine.compactGuardStore(name)
        respond(ex, 200,
          s"""{"status":"SUCCESS","compacted":${jstr(name)}}""")
      } else if (insert.matches()) {
        val topic = insert.group(1)
        val cols = insert.group(2).split(",").map(_.trim).toSeq
        val vals = parseValues(insert.group(3))
        require(cols.length == vals.length,
          s"INSERT INTO $topic: ${cols.length} columns but ${vals.length} values")
        engine.insertInto(topic, cols, vals)
        respond(ex, 200, s"""{"status":"SUCCESS","topic":${jstr(topic)}}""")
      } else if (print.matches()) {
        // `PRINT <topic>` — tail the raw topic as chunked NDJSON over the
        // same push path as EMIT CHANGES (the ksql CLI streams PRINT
        // output exactly like a push query), self-terminating at LIMIT
        val df = engine.topicStream(print.group(1)).getOrElse(
          throw new IllegalArgumentException(
            s"PRINT: unknown topic '${print.group(1)}'"))
        pushQuery(ex, df,
          Option(print.group(2)).map(_.toInt).getOrElse(maxRows).min(maxRows))
      } else if (upper == "SHOW QUERIES") {
        val qs = engine.showQueries.map { case (n, active) =>
          s"""{"name":${jstr(n)},"state":${jstr(if (active) "RUNNING" else "STOPPED")}}"""
        }.mkString("[", ",", "]")
        respond(ex, 200, s"""{"queries":$qs}""")
      } else if (upper == "SHOW STREAMS") {
        respond(ex, 200, engine.showStreams.map(jstr)
          .mkString("""{"streams":[""", ",", "]}"))
      } else if (upper == "SHOW TABLES") {
        respond(ex, 200, engine.showTables.map(jstr)
          .mkString("""{"tables":[""", ",", "]}"))
      } else if (upper == "SHOW TOPICS") {
        respond(ex, 200, engine.showTopics.map(jstr)
          .mkString("""{"topics":[""", ",", "]}"))
      } else if (upper == "SHOW FUNCTIONS") {
        val fs = engine.showFunctions.map { case (n, usage) =>
          s"""{"name":${jstr(n)},"usage":${jstr(usage)}}"""
        }.mkString("[", ",", "]")
        respond(ex, 200, s"""{"functions":$fs}""")
      } else if (upper == "SHOW CONNECTORS") {
        val cs = engine.showConnectors.map { case (n, kind) =>
          s"""{"name":${jstr(n)},"type":${jstr(kind)}}"""
        }.mkString("[", ",", "]")
        respond(ex, 200, s"""{"connectors":$cs}""")
      } else if (upper.startsWith("DROP CONNECTOR ")) {
        val name = stmt.substring("DROP CONNECTOR ".length).trim
        engine.dropConnector(name)
        respond(ex, 200, s"""{"dropped":${jstr(name)}}""")
      } else if (upper.startsWith("SET ")) {
        // `SET 'auto.offset.reset' = 'earliest'` (ksqldb-statements.sql:49):
        // offset control is a per-source option here
        // (Streams.kafkaEvents startingOffsets) — accept and acknowledge.
        respond(ex, 200, """{"status":"SUCCESS"}""")
      } else if (upper.startsWith("DROP STREAM ") || upper.startsWith("DROP TABLE ")) {
        val name = stmt.split("\\s+", 3)(2).trim
        engine.drop(name)
        respond(ex, 200, s"""{"dropped":${jstr(name)}}""")
      } else if (upper.startsWith("DESCRIBE ")) {
        // optional EXTENDED token (readme.md:229 documents the form)
        val name = stmt.substring("DESCRIBE ".length).trim
          .replaceFirst("(?i)^EXTENDED\\s+", "")
        respond(ex, 200,
          s"""{"name":${jstr(name)},"schema":${jstr(engine.describe(name))}}""")
      } else if (upper.startsWith("EXPLAIN ")) {
        // `EXPLAIN <select>` or `EXPLAIN <stream|table|topic>` — ksqlDB's
        // plan introspection; the body is the formatted Spark plan
        val target = stmt.substring("EXPLAIN ".length).trim
        respond(ex, 200, s"""{"plan":${jstr(engine.explain(target))}}""")
      } else if (upper.startsWith("TERMINATE ")) {
        val name = stmt.substring("TERMINATE ".length).trim
        engine.terminate(name)
        respond(ex, 200, s"""{"terminated":${jstr(name)}}""")
      } else if (connector.matches()) {
        // connector DDL — props are quoted dotted keys, kept case-sensitive
        // (Kafka-Connect config keys are; ksqldb-statements.sql:1-11,19-38)
        val (kind, name) = (connector.group(1).toUpperCase, connector.group(2))
        val m = connPropRe.matcher(connector.group(3))
        val props = Map.newBuilder[String, String]
        while (m.find()) props += m.group(1) -> m.group(2)
        val created =
          if (kind == "SINK") engine.createSinkConnector(name, props.result())
          else engine.createSourceConnector(name, props.result())
        respond(ex, 200, s"""{"status":"SUCCESS","name":${jstr(name)},""" +
          created.map(jstr).mkString(""""created":[""", ",", "]}"))
      } else if (create.matches()) {
        val (kind, name) = (create.group(1).toUpperCase, create.group(2))
        val props = withProps(Option(create.group(3)).getOrElse(""))
        // a ksqlDB CSAS body ends in EMIT CHANGES (ksqldb-statements.sql:14)
        // — continuous emission is what a Spark streaming plan already is
        val sel = create.group(4).replaceFirst("(?is)\\s+EMIT\\s+CHANGES\\s*$", "")
        val df = engine.pullQuery(sel) // resolves upsert views too
        if (kind == "STREAM") {
          require(df.isStreaming,
            s"CREATE STREAM $name: the SELECT must read a streaming source " +
              "(registered stream view); for batch results use /query")
          engine.createStreamAs(name, df)
          // WITH (KAFKA_TOPIC='t') names the backing topic — register the
          // alias so sink connectors can attach to it
          // (ksqldb-statements.sql:50-52's 'ratings-enriched')
          props.get("KAFKA_TOPIC").foreach(engine.registerTopic(_, df))
        } else {
          val keys = props.get("KEYS").map(_.split(",").map(_.trim).toSeq)
            .getOrElse(throw new IllegalArgumentException(
              s"CREATE TABLE $name: WITH (KEYS='k1,k2') is required — the " +
                "upsert materialization compacts to latest per key"))
          val dir = props.getOrElse("DIR", java.nio.file.Files
            .createTempDirectory(s"graft-upsert-$name").toString)
          engine.createUpsertTableAs(name, df, keys, dir,
            props.get("COMPACT_EVERY").map(_.toInt).getOrElse(0))
        }
        respond(ex, 200, s"""{"status":"SUCCESS","name":${jstr(name)}}""")
      } else if (decl.matches()) {
        // source DECLARATION over an existing topic — no AS SELECT
        // (`CREATE STREAM RATINGS WITH (KAFKA_TOPIC='ratings', ...)`,
        // rest_example.sh:33; `CREATE TABLE CUSTOMERS (CUSTOMER_ID VARCHAR
        // PRIMARY KEY) WITH (...)`, ksqldb-statements.sql:42-43)
        val (kind, name) = (decl.group(1).toUpperCase, decl.group(2))
        val props = withProps(decl.group(4))
        val topic = props.getOrElse("KAFKA_TOPIC",
          throw new IllegalArgumentException(
            s"CREATE $kind $name: WITH (KAFKA_TOPIC='...') is required"))
        if (kind == "STREAM") {
          // no column list + VALUE_FORMAT='AVRO' + a registry-backed
          // engine → subject-latest schema inference (commands.sql:13's
          // `CREATE STREAM RATINGS WITH (VALUE_FORMAT='AVRO')` form);
          // otherwise the topic's own (already-typed) schema wins
          val avro = props.get("VALUE_FORMAT").exists(_.equalsIgnoreCase("AVRO"))
          if (decl.group(3) == null && avro && engine.registry.isDefined)
            engine.declareStreamInferred(name, topic)
          else engine.declareStream(name, topic)
        } else {
          val pkm = primaryKeyRe.matcher(Option(decl.group(3)).getOrElse(""))
          engine.declareTable(name, topic,
            if (pkm.find()) Some(pkm.group(1)) else None,
            props.getOrElse("DIR", java.nio.file.Files
              .createTempDirectory(s"graft-upsert-$name").toString))
        }
        respond(ex, 200, s"""{"status":"SUCCESS","name":${jstr(name)}}""")
      } else {
        respond(ex, 400,
          s"""{"error":"unsupported statement","statement":${jstr(stmt)}}""")
      }
    } catch {
      case e: Exception => errorResponse(ex, e)
    }
  })

  server.createContext("/query", (ex: HttpExchange) => {
    val body = readBody(ex) // read once — the request stream is consumable
    val sql = jsonField(body, "sql").orElse(jsonField(body, "ksql"))
      .getOrElse("").trim.stripSuffix(";").trim
    val emit = emitRe.matcher(sql)
    val print = printRe.matcher(sql)
    try {
      if (print.matches()) {
        val df = engine.topicStream(print.group(1)).getOrElse(
          throw new IllegalArgumentException(
            s"PRINT: unknown topic '${print.group(1)}'"))
        pushQuery(ex, df,
          Option(print.group(2)).map(_.toInt).getOrElse(maxRows).min(maxRows))
      } else if (emit.matches()) {
        val sel = emit.group(1)
        val lim = Option(emit.group(2)).map(_.toInt).getOrElse(maxRows)
          .min(maxRows)
        // TABLE push (ksqldb-statements.sql:96-102): when the FROM target
        // is an upsert-materialized TABLE, the push subscription is its
        // changelog — substitute the streaming changelog view for the
        // batch upsert view so a key RE-EMITS on every update, then run
        // the same SELECT over it.
        val fromM = java.util.regex.Pattern
          .compile("(?i)\\bFROM\\s+([A-Za-z_][A-Za-z0-9_]*)").matcher(sel)
        val tablePush =
          if (fromM.find())
            engine.changelogStream(fromM.group(1)).map((fromM.group(1), _))
          else None
        tablePush match {
          case Some((tableName, changelog)) =>
            val view = s"graft_chlog_${instanceTag}_${pushNames.incrementAndGet()}"
            changelog.createOrReplaceTempView(view)
            try pushQuery(ex, engine.spark.sql(
                sel.replaceAll("(?i)\\b" + tableName + "\\b", view)), lim)
            finally {
              try engine.spark.catalog.dropTempView(view)
              catch { case _: Exception => () }
            }
          case None => pushQuery(ex, engine.spark.sql(sel), lim)
        }
      } else {
        val rows = engine.pullQuery(sql).limit(maxRows).toJSON.collect()
        respond(ex, 200, rows.mkString("[", ",", "]"))
      }
    } catch {
      case e: Exception => errorResponse(ex, e)
    }
  })

  /** Push query over HTTP: run a streaming plan (an `EMIT CHANGES` SELECT
    * or a `PRINT`ed raw topic) as a continuous query into a uniquely-named
    * memory sink and stream its rows back as chunked NDJSON as they arrive
    * — ksqlDB's `/query` + `EMIT CHANGES` contract. The memory sink
    * appends whole microbatches in order, so the already-sent prefix is
    * stable and each poll emits only the suffix. Terminates when the LIMIT
    * is reached (the query self-stops — [[Streams.pushQueryWithLimit]]) or
    * the client disconnects (the write fails → query stopped, state
    * cleaned). */
  private def pushQuery(ex: HttpExchange, df: org.apache.spark.sql.DataFrame,
                        limit: Int): Unit = {
    val spark = engine.spark
    if (!df.isStreaming)
      throw new IllegalArgumentException(
        "EMIT CHANGES requires a streaming source; use a bare SELECT for " +
          "pull queries")
    // Query names are scoped to the SparkSession, not this server — a
    // second RestServer (or a restart) over the same session must not
    // collide with a still-draining query from another instance, so the
    // name carries a per-JVM unique id on top of the per-server counter.
    val name = s"graft_push_${instanceTag}_${pushNames.incrementAndGet()}"
    val q = Streams.pushQueryWithLimit(df, limit, name)
    // Everything after the query starts — INCLUDING sending the response
    // headers, which throws if the client already disconnected — runs
    // under the finally that stops the query, or an early hangup would
    // orphan a running StreamingQuery and its growing memory table.
    var emitted = 0
    try {
      ex.getResponseHeaders.set("Content-Type", "application/x-ndjson")
      ex.sendResponseHeaders(200, 0) // length 0 → chunked streaming body
      val os = ex.getResponseBody
      // Stream until the monitor stops the query at LIMIT rows, then drain.
      var active = true
      while (active) {
        active = q.isActive
        val rows = try spark.table(name).toJSON.collect()
        catch { case _: AnalysisException => Array.empty[String] } // sink not registered yet
        while (emitted < rows.length && emitted < limit) {
          os.write((rows(emitted) + "\n").getBytes(StandardCharsets.UTF_8))
          emitted += 1
        }
        os.flush()
        if (active) Thread.sleep(25)
      }
      os.close()
    } catch {
      case _: Exception => () // client went away — stop and clean up
    } finally {
      if (q.isActive) q.stop()
      try spark.catalog.dropTempView(name) catch { case _: Exception => () }
      try ex.getResponseBody.close() catch { case _: Exception => () }
    }
  }

  def start(): RestServer = { server.start(); this }

  def stop(): Unit = server.stop(0)
}

object RestServer {
  /** Per-JVM server id sequence — streaming query names are unique per
    * SparkSession, so each server instance prefixes its push-query names
    * with its own id (two servers over one session must not collide). */
  private val instanceIds = new java.util.concurrent.atomic.AtomicLong()
}
