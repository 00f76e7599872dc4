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

  test("non-deterministic source: rowCounts always match the written file") {
    val dir = Files.createTempDirectory("graft-smallb-nondet").toString
    val table = manyLeafTable(dir)
    // rand() makes the plan non-deterministic: a second evaluation would
    // select a different subset — counts must come from the single
    // evaluated pass (the written file), never a re-run of the plan
    import org.apache.spark.sql.functions.rand
    table.ingest((0L until 1000L).map(i => (i, i)).toDF("k", "v")
      .filter(rand(seed = System.nanoTime()) < 0.5))
    val refs = table.store.fileReferences
    val metaCount = refs.map(_.rowCount).sum
    assert(metaCount == table.toDF.count(),
      "FileReference rowCounts must equal the file's real contents")
    // per-leaf counts individually consistent with a clipped read
    refs.foreach { r =>
      val leaf = table.store.partitionTree.partitions.find(_.id == r.partitionId).get
      val rg = leaf.region.ranges.head
      val lo = rg.min.map(_.asInstanceOf[Long]).getOrElse(Long.MinValue)
      val hi = rg.max.map(_.asInstanceOf[Long]).getOrElse(Long.MaxValue)
      val got = table.toDF.filter($"k" >= lo && $"k" < hi).count()
      assert(got == r.rowCount, s"leaf ${r.partitionId}: $got != ${r.rowCount}")
    }
  }

  test("size-gate backstop: an underestimated batch falls back to per-leaf") {
    val dir = Files.createTempDirectory("graft-smallb-backstop").toString
    val table = manyLeafTable(dir)
    // force the backstop: any written spool exceeds 0 × SmallBatchBytes
    System.setProperty("graft.ingest.smallBatchFallbackMultiple", "0")
    try table.ingest((0L until 1000L by 10L).map(i => (i, i)).toDF("k", "v"))
    finally System.clearProperty("graft.ingest.smallBatchFallbackMultiple")
    val refs = table.store.fileReferences
    // per-leaf layout, not one shared root-homed file
    assert(refs.forall(r => r.physicalPartitionId == r.partitionId),
      "backstop routes through the per-leaf path")
    assert(refs.map(_.filename).distinct.size > 1)
    assert(refs.map(_.rowCount).sum == 100L)
    assert(table.toDF.count() == 100)
    // the spool directory was cleaned up
    val leftovers = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith(".ingest-"))
    assert(leftovers.isEmpty, s"spool dirs left behind: ${leftovers.mkString(",")}")
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
