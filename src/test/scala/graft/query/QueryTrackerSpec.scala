package graft.query

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{GraftField, GraftSchema}
import graft.table.GraftTable

class QueryTrackerSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", 2).getOrCreate()

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("key", StringType)),
    sortKeys = Nil,
    values = Seq(GraftField("count", LongType)))

  private def newTable(): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, Files.createTempDirectory("graft-qt").toString,
      schema, splitPoints = Seq("m"))
    t.ingest(Seq(("apple", 1L), ("mango", 2L), ("zebra", 3L)).toDF("key", "count"))
    t
  }

  test("run tracks QUEUED -> IN_PROGRESS -> COMPLETED with the row count") {
    var now = 1000L
    val ex = new TrackedQueryExecutor(newTable(), clock = () => { now += 1; now })
    val df = ex.run("q1", GraftQuery.all)
    assert(df.count() == 3)
    val t = ex.tracker.get("q1").get
    assert(t.state == QueryState.Completed)
    assert(t.rowCount.contains(3L))
    assert(t.errorMessage.isEmpty)
    assert(t.lastUpdateMs > 1000L)
    assert(ex.stateOf("q1").contains(QueryState.Completed))
  }

  test("a failing query is tracked FAILED with the error message") {
    val ex = new TrackedQueryExecutor(newTable())
    val bad = GraftQuery(queryTimeTransform = Some(df => df.selectExpr("no_such_column")))
    intercept[Exception] { ex.run("q2", bad) }
    val t = ex.tracker.get("q2").get
    assert(t.state == QueryState.Failed)
    assert(t.errorMessage.nonEmpty)
    assert(t.rowCount.isEmpty)
  }

  test("tracker upserts by (queryId, subQueryId) and filters by state") {
    val s = new InMemoryQueryTracker
    s.put(TrackedQuery("q", state = QueryState.Queued, lastUpdateMs = 1))
    s.put(TrackedQuery("q", state = QueryState.InProgress, lastUpdateMs = 2))
    s.put(TrackedQuery("q", subQueryId = Some("leaf-1"), state = QueryState.Completed, lastUpdateMs = 3))
    assert(s.get("q").get.state == QueryState.InProgress) // upserted, not duplicated
    assert(s.family("q").size == 2)
    assert(s.inState(QueryState.Completed).map(_.subQueryId) == Seq(Some("leaf-1")))
  }

  test("parent state derives from children like the reference") {
    import QueryState._
    def tq(st: QueryState) = TrackedQuery("p", Some("s"), st)
    assert(parentStateIfFinished(Nil).isEmpty)
    assert(parentStateIfFinished(Seq(tq(InProgress), tq(Completed))).isEmpty)
    assert(parentStateIfFinished(Seq(tq(Completed), tq(Completed))).contains(Completed))
    assert(parentStateIfFinished(Seq(tq(Failed), tq(Failed))).contains(Failed))
    assert(parentStateIfFinished(Seq(tq(Completed), tq(Failed))).contains(PartiallyFailed))
    assert(parentStateIfFinished(Seq(tq(Completed), tq(PartiallyFailed))).contains(PartiallyFailed))
  }

  test("state names round-trip (interchange with the reference's enum)") {
    QueryState.values.foreach(s => assert(QueryState.fromName(s.name) == s))
    intercept[IllegalArgumentException](QueryState.fromName("NOPE"))
  }
}
