package graft.query

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.GraftTable

/** The out-of-process submission path: reference-shaped query JSON in
  * (file or inline), parquet results + a status JSON out — what a
  * non-JVM client drives through spark-submit.
  */
class QueryRunnerSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-runner").toString
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(25L))
    table.ingest((1L to 50L).map(i => (i, i * 10)).toDF("k", "v"))
    dir
  }

  test("keys-form query JSON from a file runs to COMPLETED with parquet + status") {
    val dir = mkTable()
    val out = Files.createTempDirectory("graft-runner-out").toString
    val qf = Files.createTempFile("graft-query", ".json")
    Files.writeString(qf,
      """{"queryId": "q-keys-7", "type": "Query", "keys": [ {"k": 7}, {"k": 33} ]}""")

    val rc = QueryRunner.run(Array(dir, s"@$qf", out))
    assert(rc == 0)

    val rows = spark.read.parquet(s"$out/q-keys-7")
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(rows == Set((7L, 70L), (33L, 330L)))

    val status = Files.readString(java.nio.file.Paths.get(out, "q-keys-7.status.json"))
    assert(status.contains(""""state":"COMPLETED""""))
    assert(status.contains(""""rowCount":2"""))
  }

  test("inline regions-form JSON with projection runs and prunes columns") {
    val dir = mkTable()
    val out = Files.createTempDirectory("graft-runner-out2").toString
    val json =
      """{"queryId": "q-range", "type": "Query",
        |  "regions": [ {"k": {"min": 10, "minInclusive": true, "max": 20, "maxInclusive": false}} ],
        |  "requestedValueFields": ["v"]}""".stripMargin

    val rc = QueryRunner.run(Array(dir, json, out))
    assert(rc == 0)
    val df = spark.read.parquet(s"$out/q-range")
    assert(df.columns.sorted.toSeq == Seq("k", "v")) // keys always ride along
    assert(df.count() == 10)
  }

  test("a broken query fails with a FAILED status and non-zero exit") {
    val dir = mkTable()
    val out = Files.createTempDirectory("graft-runner-out3").toString
    val rc = QueryRunner.run(Array(dir,
      """{"queryId": "q-bad", "type": "Query",
        |  "queryTimeIteratorClassName": "does.not.Exist"}""".stripMargin, out))
    assert(rc == 1)
    val status = Files.readString(java.nio.file.Paths.get(out, "q-bad.status.json"))
    assert(status.contains(""""state":"FAILED""""))
  }
}
