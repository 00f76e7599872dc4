package graft.query

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** The S5 results-output surface: file (parquet) and queue (JSON batch)
  * delivery behind the reference's ResultsOutput contract, plus tracked
  * publishing.
  */
class ResultsOutputSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  private def freshTable(): GraftTable = {
    val dir = Files.createTempDirectory("graft-results").toString
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L))
    table.ingest((1L to 100L).map(i => (i, i * 10)).toDF("k", "v"))
    table
  }

  test("file output writes parquet per query id and reports the row count") {
    val table = freshTable()
    val base = Files.createTempDirectory("graft-out").toString
    val info = new FileResultsOutput(base).publish("q1", table.toDF)
    assert(info.error.isEmpty && info.rowCount == 100)
    assert(info.locations == Seq(ResultsOutputLocation("DATA", s"$base/q1")))
    assert(spark.read.parquet(s"$base/q1").count() == 100)
  }

  test("queue output batches JSON rows and loses nothing") {
    val table = freshTable()
    val q = new InMemoryResultsQueue(s"spec-${java.util.UUID.randomUUID()}")
    val info = new QueueResultsOutput(q, batchSize = 7).publish("q2", table.toDF)
    assert(info.error.isEmpty && info.rowCount == 100)
    val msgs = InMemoryResultsQueue.drain(q.toString.stripPrefix("memory://"))
    // 2 leaves -> >= 2 partitions, each flushing ceil(n/7) batches
    assert(msgs.nonEmpty && msgs.forall(_.startsWith("""{"queryId":"q2"""")))
    val rows = spark.read.json(spark.createDataset(msgs))
      .selectExpr("explode(rows) AS r").select("r.k", "r.v")
      .as[(Long, Long)].collect().toSet
    assert(rows == (1L to 100L).map(i => (i, i * 10)).toSet)
  }

  test("tracked publish completes with the published row count; delivery errors track FAILED") {
    val table = freshTable()
    val ex = new TrackedQueryExecutor(table)
    val q = new InMemoryResultsQueue(s"spec-${java.util.UUID.randomUUID()}")
    val info = ex.publish("pq", GraftQuery.forRegions(
      Region(KeyRange.minMax("k", 1L, 31L))), new QueueResultsOutput(q))
    assert(info.error.isEmpty && info.rowCount == 30)
    assert(ex.tracker.get("pq").get.rowCount.contains(30L))
    assert(ex.stateOf("pq").contains(QueryState.Completed))

    val boom = new ResultsQueue { def send(m: String): Unit = sys.error("queue down") }
    val bad = ex.publish("pq2", GraftQuery.all, new QueueResultsOutput(boom))
    assert(bad.error.isDefined)
    assert(ex.stateOf("pq2").contains(QueryState.Failed))
    assert(ex.tracker.get("pq2").get.errorMessage.isDefined)
  }
}
