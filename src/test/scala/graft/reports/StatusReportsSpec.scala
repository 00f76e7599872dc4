package graft.reports

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{GraftField, GraftSchema, KeyRange, Region}
import graft.jobs.FileCompactionJobTracker
import graft.query.{FileQueryTracker, GraftQuery, TrackedQueryExecutor}
import graft.table.{GraftTable, TableConfig}

/** The report surface against a seeded lifecycle, mirroring the
  * reference's report tests (clients/report/...): counts in the
  * rendered text must equal ground truth from the seeding actions —
  * files referenced/unreferenced, partitions needing splits, compaction
  * jobs committed, queries completed.
  */
class StatusReportsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Seq(GraftField("ts", LongType)),
    values = Seq(GraftField("v", LongType)))

  test("reports over a seeded lifecycle carry the ground-truth numbers") {
    val dir = Files.createTempDirectory("graft-reports").toString
    // split threshold of 10 rows: both 50-row leaves MUST need splitting
    val table = GraftTable.create(spark, dir, schema,
      splitPoints = Seq(50L), config = TableConfig(splitThreshold = 10))
    val rows = (0L until 100L).map(i => (i, i % 7, i * 2))
    table.ingest(rows.filter(_._1 % 2 == 0).toDF("k", "ts", "v"))
    table.ingest(rows.filter(_._1 % 2 == 1).toDF("k", "ts", "v"))

    // two batches -> 2 files per leaf before compaction
    val files0 = StatusReports.filesStatus(table)
    assert(files0.contains("There are 2 leaf partitions and 1 non-leaf partitions"))
    assert(files0.contains("Number of files with references: 4"))
    assert(files0.contains("Number of rows referenced in leaf partitions: 100"))

    val parts = StatusReports.partitionsStatus(table)
    assert(parts.contains("There are 3 partitions (2 leaf partitions)"))
    assert(parts.contains("Split threshold is 10 rows"))
    assert(parts.contains("There are 2 leaf partitions that need splitting"))

    // DataFrame variants carry the same numbers as queryable relations
    val pdf = StatusReports.partitionsStatusDF(table)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(pdf == Seq(("-inf", 2L, 50L, true), ("50", 2L, 50L, true)))
    val fdf = StatusReports.filesStatusDF(table)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(fdf == ((2L, 1L, 4L, 0L, 4L, 100L)))
    assert(parts.contains("NEEDS SPLITTING"))

    // pre-compaction: all 100 rows are ingest backlog
    val ing0 = StatusReports.ingest(table)
    assert(ing0.contains("Ingested rows awaiting compaction: 100"))
    assert(ing0.contains("Files from compaction rewrites: 0"))

    // compact under a durable tracker: 2 jobs commit, old files become
    // GC-eligible and must show in the files report
    val ctDir = s"$dir/trackers/compactions"
    table.compactAll(new FileCompactionJobTracker(ctDir))
    val compTracked = new FileCompactionJobTracker(ctDir)
    val comp = StatusReports.compactionJobs(compTracked)
    assert(comp.contains("Total jobs: 2"))
    assert(comp.contains("Jobs COMMITTED: 2"))
    assert(comp.contains("Jobs unfinished: 0"))

    val files1 = StatusReports.filesStatus(table, verbose = true)
    assert(files1.contains("Number of files with references: 2"))
    assert(files1.contains(
      "Number of files with no references, which will be garbage collected: 4"))
    assert(files1.contains("Files with no references"))

    // post-compaction: backlog drained, rows live in rewrite files
    val ing = StatusReports.ingest(table)
    assert(ing.contains("Ingested rows awaiting compaction: 0"))
    assert(ing.contains("Files from compaction rewrites: 2"))
    assert(ing.contains("Rows in compacted files: 100"))

    // a tracked query (durable tracker), one completed + one failed
    val qtDir = s"$dir/trackers/queries"
    val qt = new FileQueryTracker(qtDir)
    val ex = new TrackedQueryExecutor(table, qt)
    ex.run("q-ok", GraftQuery.forRegions(Region(KeyRange.minMax("k", 0L, 100L))))
    intercept[Exception] {
      ex.run("q-bad", GraftQuery(
        regions = Seq(Region(KeyRange.minMax("k", 0L, 1L))),
        queryTransformConfig = Some("no.such.TransformClass{}")))
    }
    val qrep = StatusReports.queries(new FileQueryTracker(qtDir))
    assert(qrep.contains("Total tracked queries: 2"))
    assert(qrep.contains("Queries COMPLETED: 1"))
    assert(qrep.contains("Queries FAILED: 1"))
    assert(qrep.contains("q-ok: COMPLETED, rows=100"))

    // the CLI front-end renders the same content
    val cli = ReportMain.render(spark, dir, Seq("full"))
    assert(cli.contains("Files Status Report:"))
    assert(cli.contains("Partitions Status Report:"))
    assert(cli.contains("Ingest Status Report:"))
    assert(cli.contains("Compaction Job Status Report:"))
    assert(cli.contains("Query Status Report:"))
  }
}
