package graft.query

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.table.GraftTable

/** Minimal REST surface over the engine — the in-repo counterpart of
  * the reference's rest-api module (reference:
  * java/rest-api/src/main/java/sleeper/restapi/ — currently an
  * add-table route behind API Gateway) extended with the query and
  * status routes its roadmap implies, expressed over the JDK's
  * built-in HTTP server so the serving tier needs no new dependency:
  *
  *   POST /tables                 {"name","tableDir"} — register a
  *                                table directory (load-on-register)
  *   POST /tables/{name}/query    interchange query JSON (same shape
  *                                as [[QueryRunner]]/the Python
  *                                client); runs synchronously, responds
  *                                {"queryId","state","rowCount","rows"}
  *                                with rows capped at `maxRows`
  *   POST /tables/{name}/query?mode=async
  *                                ASYNC submission: responds 202
  *                                Accepted immediately with a
  *                                `Location: /queries/{id}` header; the
  *                                query runs on a server pool and the
  *                                client polls the status route to
  *                                COMPLETED/FAILED — the shape for
  *                                queries too long to hold an HTTP
  *                                connection open (results flow to the
  *                                parquet/queue outputs, the
  *                                reference's async split)
  *   GET  /queries/{queryId}      last tracker record for the id
  *
  * Query execution is the library's own tracked path
  * ([[TrackedQueryExecutor]]), so REST-submitted queries land in the
  * same tracker (durable if constructed with a [[FileQueryTracker]])
  * as spark-submit ones. The row cap keeps the synchronous response
  * bounded — larger results belong to the parquet/queue outputs, which
  * is exactly the reference's split between its WebSocket row responses
  * and S3 result files. Test-grade by design: a deployment would
  * terminate TLS/auth in front (API Gateway's role in the reference).
  */
final class GraftRestServer(spark: SparkSession,
    tracker: QueryTrackerStore = new InMemoryQueryTracker,
    maxRows: Int = 10000, port: Int = 0) extends AutoCloseable {

  private val tables = new ConcurrentHashMap[String, GraftTable]()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  server.createContext("/tables", (ex: HttpExchange) => safely(ex) {
    val path = ex.getRequestURI.getPath.stripPrefix("/tables").stripPrefix("/")
    (ex.getRequestMethod, path.split("/").filter(_.nonEmpty).toList) match {
      case ("POST", Nil) => addTable(ex)
      case ("POST", name :: "query" :: Nil) => runQuery(ex, name)
      case _ => respond(ex, 404, """{"error":"not found"}""")
    }
  })
  server.createContext("/queries", (ex: HttpExchange) => safely(ex) {
    val id = ex.getRequestURI.getPath.stripPrefix("/queries").stripPrefix("/")
    if (ex.getRequestMethod != "GET" || id.isEmpty)
      respond(ex, 404, """{"error":"not found"}""")
    else tracker.get(id) match {
      case None => respond(ex, 404, s"""{"error":"unknown queryId ${RestJson.esc(id)}"}""")
      case Some(t) => respond(ex, 200, FileQueryTracker.toJson(t))
    }
  })
  // status polls must not queue behind a running query, and async
  // submissions need somewhere to run: handlers on a cached pool, query
  // bodies on their own pool (daemon threads — server shutdown wins)
  private val httpPool = java.util.concurrent.Executors.newCachedThreadPool(daemonFactory("rest-http"))
  private val queryPool = java.util.concurrent.Executors.newCachedThreadPool(daemonFactory("rest-query"))
  server.setExecutor(httpPool)
  server.start()

  private def daemonFactory(prefix: String): java.util.concurrent.ThreadFactory =
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger()
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"$prefix-${n.incrementAndGet()}")
        t.setDaemon(true); t
      }
    }

  val address: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  /** Pre-register a table (programmatic alternative to POST /tables). */
  def register(name: String, table: GraftTable): this.type = {
    tables.put(name, table); this
  }

  private def addTable(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val m = JsonMethods.parse(body).asInstanceOf[JObject].obj.toMap
    def str(k: String) = m.get(k).collect { case JString(s) => s }
    (str("name"), str("tableDir")) match {
      case (Some(name), Some(dir)) =>
        tables.put(name, GraftTable.load(spark, dir))
        respond(ex, 201, s"""{"name":${RestJson.jsonEscape(name)},"status":"registered"}""")
      case _ => respond(ex, 400, """{"error":"body must carry name and tableDir"}""")
    }
  }

  private def runQuery(ex: HttpExchange, name: String): Unit = {
    val table = tables.get(name)
    if (table == null) {
      respond(ex, 404, s"""{"error":"unknown table ${RestJson.esc(name)}"}"""); return
    }
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val queryId = try {
      JsonMethods.parse(body) match {
        case o: JObject => o.obj.toMap.get("queryId")
          .collect { case JString(s) => s }.getOrElse(java.util.UUID.randomUUID().toString)
        case _ => java.util.UUID.randomUUID().toString
      }
    } catch { case scala.util.control.NonFatal(_) => java.util.UUID.randomUUID().toString }
    val exec = new TrackedQueryExecutor(table, tracker)
    val async = Option(ex.getRequestURI.getQuery).exists(_.contains("mode=async"))
    if (async) {
      // parse errors surface NOW (400); execution errors surface in the
      // tracker. The QUEUED record is written on THIS thread so a poll
      // racing the submission never 404s.
      val q = try GraftQuery.fromJson(body, table.schema) catch {
        case scala.util.control.NonFatal(e) =>
          respond(ex, 400,
            s"""{"queryId":${RestJson.jsonEscape(queryId)},"state":"FAILED",""" +
              s""""error":${RestJson.jsonEscape(String.valueOf(e.getMessage))}}""")
          return
      }
      tracker.put(TrackedQuery(queryId, state = QueryState.Queued,
        lastUpdateMs = System.currentTimeMillis()))
      queryPool.submit(new Runnable {
        override def run(): Unit =
          try exec.run(queryId, q)
          catch { case scala.util.control.NonFatal(_) => () } // tracker holds FAILED
      })
      ex.getResponseHeaders.set("Location", s"/queries/$queryId")
      respond(ex, 202,
        s"""{"queryId":${RestJson.jsonEscape(queryId)},"state":"QUEUED",""" +
          s""""location":"/queries/${RestJson.esc(queryId)}"}""")
      return
    }
    try {
      val q = GraftQuery.fromJson(body, table.schema)
      val df = exec.run(queryId, q)
      val rows = df.toJSON.take(maxRows + 1)
      val truncated = rows.length > maxRows
      val kept = if (truncated) rows.dropRight(1) else rows
      val count = tracker.get(queryId).flatMap(_.rowCount).getOrElse(kept.length.toLong)
      respond(ex, 200,
        s"""{"queryId":${RestJson.jsonEscape(queryId)},"state":"COMPLETED",""" +
          s""""rowCount":$count,"truncated":$truncated,"rows":[${kept.mkString(",")}]}""")
    } catch {
      case scala.util.control.NonFatal(e) =>
        // tracker already holds FAILED + message via TrackedQueryExecutor
        respond(ex, 400,
          s"""{"queryId":${RestJson.jsonEscape(queryId)},"state":"FAILED",""" +
            s""""error":${RestJson.jsonEscape(String.valueOf(e.getMessage))}}""")
    }
  }

  private def safely(ex: HttpExchange)(body: => Unit): Unit =
    try body
    catch {
      case scala.util.control.NonFatal(e) =>
        try respond(ex, 500, s"""{"error":${RestJson.jsonEscape(String.valueOf(e.getMessage))}}""")
        catch { case scala.util.control.NonFatal(_) => () }
    } finally ex.close()

  private def respond(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  override def close(): Unit = {
    server.stop(0)
    httpPool.shutdownNow()
    queryPool.shutdownNow()
  }
}

private object RestJson {
  def jsonEscape(s: String): String = graft.Verify.jsonEscape(s)
  /** Escaped INNER text (no surrounding quotes) for message composition. */
  def esc(s: String): String = {
    val q = graft.Verify.jsonEscape(s)
    q.substring(1, q.length - 1)
  }
}
