package graft.jobs

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** Compaction job status tracking — the reference's
  * created/started/finished/committed/failed lifecycle
  * (CompactionJobTracker.java) over graft's two compaction paths.
  */
class CompactionTrackerSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  private def tmp() = Files.createTempDirectory("graft-ctrack").toString

  test("single-job compaction tracks CREATED→…→COMMITTED with the written row count") {
    val table = GraftTable.create(spark, tmp(), schema)
    table.ingest((1L to 30L).map(i => (i, i)).toDF("k", "v"))
    table.ingest((31L to 50L).map(i => (i, i)).toDF("k", "v"))

    val tracker = new InMemoryCompactionJobTracker
    val n = new Compaction(table, tracker).runStrategy(BasicCompactionStrategy())
    assert(n == 1)
    val jobs = tracker.all
    assert(jobs.size == 1)
    val job = jobs.head
    assert(job.state == CompactionJobState.Committed)
    assert(job.inputFiles == 2)
    assert(job.rowsWritten.contains(50L))
    assert(tracker.unfinished.isEmpty)
  }

  test("whole-table compaction tracks one job per leaf; all leaves commit") {
    val table = GraftTable.create(spark, tmp(), schema, splitPoints = Seq(25L))
    table.ingest((1L to 50L).map(i => (i, i)).toDF("k", "v"))
    table.ingest((1L to 50L).map(i => (i, i * 2)).toDF("k", "v"))

    val tracker = new InMemoryCompactionJobTracker
    table.compactAll(tracker)
    val jobs = tracker.all
    assert(jobs.size == 2, s"one tracked job per leaf: $jobs")
    assert(jobs.forall(_.state == CompactionJobState.Committed))
    assert(jobs.map(_.rowsWritten.get).sum == 100L)
    assert(jobs.map(_.partitionId).distinct.size == 2)
  }

  test("a failing job tracks FAILED with the error, and a doomed job never reports COMMITTED") {
    val table = GraftTable.create(spark, tmp(), schema,
      config = TableConfig(transformConfig = "graft.transforms.CapValue{v,10}"))
    table.ingest((1L to 10L).map(i => (i, i)).toDF("k", "v"))
    table.ingest((11L to 20L).map(i => (i, i)).toDF("k", "v"))

    // sabotage: a rival assigns the files to another job first, so this
    // job's assignJob precondition fails
    val tracker = new InMemoryCompactionJobTracker
    val files = table.store.fileReferences
    table.store.assignJob("rival", files.head.partitionId, files.map(_.filename))
    intercept[Exception] {
      new Compaction(table, tracker).run(
        CompactionJob(files.head.partitionId, files))
    }
    assert(tracker.all.forall(_.state != CompactionJobState.Committed))
    // the assignment failure is VISIBLE: the job was tracked CREATED and
    // its loss to the rival surfaces as FAILED, not as a missing record
    assert(tracker.all.size == 1)
    assert(tracker.all.head.state == CompactionJobState.Failed)
    assert(tracker.all.head.errorMessage.nonEmpty)
  }

  test("batched commits: same table contents, FEWER log versions than jobs") {
    def mk(): GraftTable = {
      val t = GraftTable.create(spark, tmp(), schema,
        splitPoints = (1L until 8L).map(_ * 10L))
      (0 until 3).foreach { g =>
        t.ingest((1L to 80L).map(i => (i, i + g)).toDF("k", "v"))
      }
      t
    }
    def versionOf(t: GraftTable) =
      t.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion

    val serial = mk(); val batched = mk()
    val vS = versionOf(serial); val vB = versionOf(batched)
    val tracker = new InMemoryCompactionJobTracker
    val nS = new Compaction(serial, tracker)
      .runStrategy(BasicCompactionStrategy(), parallelism = 8)
    val nB = new Compaction(batched, tracker)
      .runStrategy(BasicCompactionStrategy(), parallelism = 8, batchCommits = true)
    assert(nS == 8 && nB == 8, "one job per leaf on both paths")
    // identical results…
    assert(batched.toDF.orderBy("k").collect().toSeq ==
      serial.toDF.orderBy("k").collect().toSeq)
    assert(batched.store.fileReferences.size == 8)
    // …but the batched run folded its 16 commits (8 assign + 8 replace)
    // into fewer log versions; serial paid one version per commit
    assert(versionOf(serial) - vS == 16L)
    assert(versionOf(batched) - vB < 16L,
      s"expected batching to fold commits, got ${versionOf(batched) - vB} versions")
  }
}
