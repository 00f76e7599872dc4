package graft.query

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.GraftTable

/** The REST serving surface end-to-end over real HTTP: register a
  * table, query it with interchange JSON, poll status — the reference's
  * rest-api boundary with query/status routes.
  */
class RestApiSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  private def mkTableDir(): String = {
    val dir = Files.createTempDirectory("graft-rest").toString
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(25L))
    table.ingest((1L to 50L).map(i => (i, i * 10)).toDF("k", "v"))
    dir
  }

  private val http = HttpClient.newHttpClient()
  private def post(url: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def get(url: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("register, query, and poll status over HTTP") {
    val dir = mkTableDir()
    val server = new GraftRestServer(spark)
    try {
      val reg = post(s"${server.address}/tables",
        s"""{"name":"t1","tableDir":${graft.Verify.jsonEscape(dir)}}""")
      assert(reg.statusCode() == 201, reg.body())

      val q = post(s"${server.address}/tables/t1/query",
        """{"queryId":"rest-q1","type":"Query","keys":[{"k":7},{"k":33}]}""")
      assert(q.statusCode() == 200, q.body())
      assert(q.body().contains(""""state":"COMPLETED""""))
      assert(q.body().contains(""""rowCount":2"""))
      assert(q.body().contains(""""k":7""") && q.body().contains(""""v":330"""))

      // range + projection through the same route
      val r = post(s"${server.address}/tables/t1/query",
        """{"queryId":"rest-q2","type":"Query",
          |"regions":[{"k":{"min":10,"minInclusive":true,"max":20,"maxInclusive":false}}],
          |"requestedValueFields":["v"]}""".stripMargin)
      assert(r.statusCode() == 200, r.body())
      assert(r.body().contains(""""rowCount":10"""))

      // the tracker route serves both terminal records
      val st = get(s"${server.address}/queries/rest-q1")
      assert(st.statusCode() == 200, st.body())
      assert(st.body().contains(""""state":"COMPLETED"""") &&
        st.body().contains(""""rowCount":2"""))
      assert(get(s"${server.address}/queries/nope").statusCode() == 404)
    } finally server.close()
  }

  test("row cap truncates the synchronous response, count stays exact") {
    val dir = mkTableDir()
    val server = new GraftRestServer(spark, maxRows = 5)
    try {
      post(s"${server.address}/tables",
        s"""{"name":"t","tableDir":${graft.Verify.jsonEscape(dir)}}""")
      val r = post(s"${server.address}/tables/t/query",
        """{"queryId":"rest-cap","type":"Query",
          |"regions":[{"k":{"min":1,"minInclusive":true,"max":50,"maxInclusive":true}}]}"""
          .stripMargin)
      assert(r.statusCode() == 200, r.body())
      assert(r.body().contains(""""truncated":true"""))
      assert(r.body().contains(""""rowCount":50""")) // exact, not capped
      assert("\"k\":".r.findAllIn(r.body()).size == 5)
    } finally server.close()
  }

  test("async submission: 202 + Location immediately, poll to COMPLETED") {
    val dir = mkTableDir()
    val server = new GraftRestServer(spark)
    try {
      post(s"${server.address}/tables",
        s"""{"name":"t","tableDir":${graft.Verify.jsonEscape(dir)}}""")
      // the sleep transform keeps the query in flight long enough that
      // the 202 provably returns before completion
      val t0 = System.nanoTime()
      val sub = post(s"${server.address}/tables/t/query?mode=async",
        """{"queryId":"rest-async","type":"Query",
          |"regions":[{"k":{"min":1,"minInclusive":true,"max":50,"maxInclusive":true}}],
          |"queryTimeIteratorChain":"graft.query.SleepTransform{1500}"}""".stripMargin)
      val submitMs = (System.nanoTime() - t0) / 1e6
      assert(sub.statusCode() == 202, sub.body())
      assert(sub.headers().firstValue("Location").orElse("") == "/queries/rest-async")
      assert(sub.body().contains(""""state":"QUEUED""""))
      assert(submitMs < 1500, s"async submit must not wait for the query (${submitMs}ms)")

      // the status route answers DURING execution (no 404 race, the
      // server is not serialized behind the running query)
      val mid = get(s"${server.address}/queries/rest-async")
      assert(mid.statusCode() == 200, mid.body())

      // poll to terminal
      val deadline = System.currentTimeMillis() + 60000
      var body = ""
      while (System.currentTimeMillis() < deadline &&
          !body.contains(""""state":"COMPLETED"""") && !body.contains(""""state":"FAILED"""")) {
        Thread.sleep(100)
        body = get(s"${server.address}/queries/rest-async").body()
      }
      assert(body.contains(""""state":"COMPLETED""""), body)
      assert(body.contains(""""rowCount":50"""), body)

      // async EXECUTION errors are accepted (202) and land as FAILED in
      // the tracker — the client learns through the same poll route
      val bad = post(s"${server.address}/tables/t/query?mode=async",
        """{"queryId":"rest-async-bad","type":"Query","queryTimeIteratorChain":"no.Such"}""")
      assert(bad.statusCode() == 202, bad.body())
      val dl2 = System.currentTimeMillis() + 30000
      var badBody = ""
      while (System.currentTimeMillis() < dl2 && !badBody.contains(""""state":"FAILED""""))
        { Thread.sleep(100); badBody = get(s"${server.address}/queries/rest-async-bad").body() }
      assert(badBody.contains(""""state":"FAILED""""), badBody)
      // async PARSE errors fail fast with 400, not a queued husk
      val malformed = post(s"${server.address}/tables/t/query?mode=async", "{broken json")
      assert(malformed.statusCode() == 400, malformed.body())
    } finally server.close()
  }

  test("failures surface as FAILED JSON, unknown tables as 404") {
    val dir = mkTableDir()
    val server = new GraftRestServer(spark)
    try {
      post(s"${server.address}/tables",
        s"""{"name":"t","tableDir":${graft.Verify.jsonEscape(dir)}}""")
      val bad = post(s"${server.address}/tables/t/query",
        """{"queryId":"rest-bad","type":"Query","queryTimeIteratorClassName":"no.Such"}""")
      assert(bad.statusCode() == 400, bad.body())
      assert(bad.body().contains(""""state":"FAILED""""))
      // and the tracker recorded the failure
      assert(get(s"${server.address}/queries/rest-bad").body()
        .contains(""""state":"FAILED""""))
      assert(post(s"${server.address}/tables/ghost/query",
        """{"keys":[{"k":1}]}""").statusCode() == 404)
    } finally server.close()
  }
}
