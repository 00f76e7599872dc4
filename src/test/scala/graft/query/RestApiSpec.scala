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
