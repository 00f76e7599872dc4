package graft.meta

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.query._
import graft.jobs._

/** Durable tracker stores: two handles (standing in for two JVMs)
  * sharing one directory see a single merged tracker — the filesystem
  * counterpart of the reference's DynamoDB tracker tables.
  */
class FileTrackerSpec extends AnyFunSuite {

  test("two FileQueryTracker handles on one directory share state; last record wins") {
    val dir = Files.createTempDirectory("graft-qtracker").toString
    val writer = new FileQueryTracker(dir)
    val watcher = new FileQueryTracker(dir) // a second process polling status

    writer.put(TrackedQuery("q1", state = QueryState.Queued, lastUpdateMs = 1))
    writer.put(TrackedQuery("q1", state = QueryState.InProgress, lastUpdateMs = 2))
    assert(watcher.get("q1").map(_.state).contains(QueryState.InProgress))

    // sub-queries track independently of the parent record
    writer.put(TrackedQuery("q1", Some("sub-a"), QueryState.Completed, 3, rowCount = Some(10)))
    writer.put(TrackedQuery("q1", Some("sub-b"), QueryState.Failed, 4,
      errorMessage = Some("boom")))
    writer.put(TrackedQuery("q1", state = QueryState.PartiallyFailed, lastUpdateMs = 5))

    val family = watcher.family("q1")
    assert(family.size == 3)
    assert(watcher.get("q1").map(_.state).contains(QueryState.PartiallyFailed))
    assert(watcher.get("q1", Some("sub-a")).flatMap(_.rowCount).contains(10L))
    assert(watcher.get("q1", Some("sub-b")).flatMap(_.errorMessage).contains("boom"))

    // the watcher writes too — same directory, one merged view
    watcher.put(TrackedQuery("q2", state = QueryState.Queued, lastUpdateMs = 6))
    assert(writer.all.map(_.queryId).toSet == Set("q1", "q2"))
    assert(writer.inState(QueryState.Queued).map(_.queryId) == Seq("q2"))
  }

  test("two FileCompactionJobTracker handles share lifecycle records across the seam") {
    val dir = Files.createTempDirectory("graft-ctracker").toString
    val worker = new FileCompactionJobTracker(dir)
    val dashboard = new FileCompactionJobTracker(dir)

    worker.put(TrackedCompactionJob("j1", "leaf-a", 3, CompactionJobState.Created, 1))
    worker.put(TrackedCompactionJob("j1", "leaf-a", 3, CompactionJobState.Started, 2))
    assert(dashboard.unfinished.map(_.jobId) == Seq("j1"))

    worker.put(TrackedCompactionJob("j1", "leaf-a", 3, CompactionJobState.Committed, 3,
      rowsWritten = Some(1234)))
    worker.put(TrackedCompactionJob("j2", "leaf-b", 2, CompactionJobState.Failed, 4,
      errorMessage = Some("assignment lost")))

    assert(dashboard.unfinished.isEmpty)
    assert(dashboard.get("j1").flatMap(_.rowsWritten).contains(1234L))
    assert(dashboard.inState(CompactionJobState.Failed).map(_.jobId) == Seq("j2"))
    assert(dashboard.all.map(_.jobId) == Seq("j1", "j2"))

    // a Compaction wired to the durable tracker is visible cross-handle
    assert(dashboard.get("j2").flatMap(_.errorMessage).contains("assignment lost"))
  }

  test("foreign or torn files are skipped, never fatal; prune bounds the directory") {
    val dir = Files.createTempDirectory("graft-tracker-junk").toString
    val t = new FileQueryTracker(dir)
    t.put(TrackedQuery("q1", state = QueryState.Completed, lastUpdateMs = 1))
    // a foreign file matching the record pattern but holding garbage
    Files.writeString(java.nio.file.Paths.get(dir, "ev-9999999999999-zzzzzzzz-000001.json"),
      "{not json")
    // and one that parses but is not a TrackedQuery
    Files.writeString(java.nio.file.Paths.get(dir, "ev-9999999999998-zzzzzzzz-000001.json"),
      """{"hello":"world"}""")
    assert(t.all.map(_.queryId) == Seq("q1"))

    val store = new EventFileStore(dir)
    (1 to 20).foreach(i => store.append(s"""{"n":$i}"""))
    store.prune(keep = 5)
    assert(store.readAll().size == 5)
  }

  test("QueryRunner with a trackerDir leaves the durable lifecycle for other processes") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val schema = graft.core.GraftSchema(
      rowKeys = Seq(graft.core.GraftField("k", org.apache.spark.sql.types.LongType)),
      sortKeys = Nil,
      values = Seq(graft.core.GraftField("v", org.apache.spark.sql.types.LongType)))
    val dir = Files.createTempDirectory("graft-runner-tracked").toString
    val table = graft.table.GraftTable.create(spark, dir, schema, splitPoints = Seq(25L))
    table.ingest((1L to 50L).map(i => (i, i * 10)).toDF("k", "v"))
    val out = Files.createTempDirectory("graft-runner-tracked-out").toString
    val trackerDir = Files.createTempDirectory("graft-runner-tracker").toString

    val rc = QueryRunner.run(Array(dir,
      """{"queryId": "q-tracked", "type": "Query", "keys": [ {"k": 7} ]}""", out, trackerDir))
    assert(rc == 0)

    // a FRESH handle (another process) reads the terminal state
    val other = new FileQueryTracker(trackerDir)
    val rec = other.get("q-tracked")
    assert(rec.map(_.state).contains(QueryState.Completed))
    assert(rec.flatMap(_.rowCount).contains(1L))
  }
}
