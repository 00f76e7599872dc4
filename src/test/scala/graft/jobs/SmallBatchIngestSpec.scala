package graft.jobs

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** Small-batch ingest on many-leaf tables: one shared root-homed file
  * per batch instead of one near-empty file per touched leaf — reads
  * clip it by region, compaction localizes it, GC deletes it once.
  */
class SmallBatchIngestSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  private def manyLeafTable(dir: String, agg: String = ""): GraftTable =
    GraftTable.create(spark, dir, schema,
      splitPoints = (1L until 100L).map(_ * 10L), // 100 leaves
      config = TableConfig(aggregationConfig = agg, gcDelayMinutes = 0))

  test("a tiny batch writes ONE shared file; reads clip; compaction localizes") {
    val dir = Files.createTempDirectory("graft-smallb").toString
    val table = manyLeafTable(dir)
    // 100 rows spread over ~100 leaves: per-leaf layout would write ~100 files
    table.ingest((0L until 1000L by 10L).map(i => (i, i)).toDF("k", "v"))
    val st = table.store
    val files = st.fileReferences
    assert(files.map(_.filename).distinct.size == 1, "ONE physical file")
    assert(files.size == 100, "one shared ref per touched leaf")
    val home = files.head.physicalPartitionId
    assert(files.forall(_.physicalPartitionId == home), "root-homed")
    assert(files.map(_.rowCount).sum == 100L, "exact per-leaf counts")

    // reads: point lookup, range scan, full scan all clip correctly
    assert(table.lookup(500L).select("v")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).head() == 500L)
    assert(table.toDF.count() == 100)
    assert(spark.read.format("graft").load(dir)
      .filter($"k" >= 100L && $"k" < 200L).count() == 10)

    // a second tiny batch = one more file (not one per leaf)
    table.ingest((5L until 1000L by 100L).map(i => (i, i + 1L)).toDF("k", "v"))
    assert(table.store.fileReferences.map(_.filename).distinct.size == 2)

    // compaction localizes the shared files into per-leaf files and the
    // shared physical files are GC'd exactly once
    table.compactAll()
    val after = table.store.fileReferences
    assert(!after.exists(r => r.physicalPartitionId != r.partitionId),
      "compaction localized every shared file")
    assert(table.toDF.count() == 110) // no agg: both generations kept
    new GarbageCollector(table).run()
    assert(table.store.unreferencedFiles.isEmpty)
    assert(table.toDF.count() == 110)
  }

  test("LWW generations resolve across shared small-batch files") {
    val dir = Files.createTempDirectory("graft-smallb-lww").toString
    val table = manyLeafTable(dir, agg = "last(v)")
    table.ingest((0L until 1000L by 10L).map(i => (i, 1L)).toDF("k", "v"))
    table.ingest((0L until 1000L by 20L).map(i => (i, 2L)).toDF("k", "v"))
    table.deleteKeys(Seq(30L).toDF("k"))
    table.ingest(Seq((30L, 9L)).toDF("k", "v")) // re-ingest above the marker
    val got = table.toDF.select("k", "v").as[(Long, Long)].collect().toMap
    assert(got.size == 100)
    assert(got(0L) == 2L && got(10L) == 1L && got(30L) == 9L)
    // and the DSv2 path agrees
    val viaSql = spark.read.format("graft").load(dir)
      .select("k", "v").as[(Long, Long)].collect().toMap
    assert(viaSql == got)
  }

  test("small trees never take the shared-file path (per-leaf layout kept)") {
    val dir = Files.createTempDirectory("graft-smallb-small").toString
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L))
    table.ingest((0L until 100L).map(i => (i, i)).toDF("k", "v"))
    val refs = table.store.fileReferences
    assert(refs.map(_.filename).distinct.size == 2, "one file per leaf")
    assert(refs.forall(r => r.physicalPartitionId == r.partitionId))
  }
}
