package graft.table

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Row-key deletes (tombstones): suppression through every read path,
  * physical purge + atomic retirement at compaction, partial-job
  * safety, persistence, and time travel.
  */
class DeleteKeysSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("id", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  private def tmp() = Files.createTempDirectory("graft-delete").toString

  test("deleteKeys suppresses rows in query and DSv2 reads; compaction purges and retires") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L))
    table.ingest((0L until 100L by 2).map(i => (i, i)).toDF("id", "v"))
    table.ingest((1L until 100L by 2).map(i => (i, i)).toDF("id", "v"))

    val refs = table.deleteKeys(Seq(7L, 8L, 63L).toDF("id"))
    assert(refs.nonEmpty && table.store.tombstones.size == refs.size)
    val expect = (0L until 100L).toSet -- Set(7L, 8L, 63L)

    assert(table.toDF.select("id").as[Long].collect().toSet == expect)
    assert(spark.read.format("graft").load(dir)
      .select("id").as[Long].collect().toSet == expect)
    // point lookup of a deleted key: empty
    assert(table.lookup(7L).count() == 0)

    table.compactAll()
    assert(table.store.tombstones.isEmpty, "compaction must retire applied tombstones")
    assert(table.toDF.select("id").as[Long].collect().toSet == expect)
    assert(spark.read.format("graft").load(dir)
      .select("id").as[Long].collect().toSet == expect)
    // purge is PHYSICAL: the surviving files do not contain the keys
    val physical = table.store.fileReferences
      .flatMap(r => spark.read.parquet(table.pathOf(r)).select("id").as[Long].collect())
    assert(physical.toSet == expect)
    // tombstone files queued for GC
    assert(table.store.unreferencedFiles.exists(_.filename.startsWith("tombstone-")))
  }

  test("pending tombstones keep the vectorized columnar path (batch-wise anti-join)") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(5000L))
    table.ingest((0L until 10000L).map(i => (i, i)).toDF("id", "v"))
    table.compactAll() // single local file per leaf → native columnar
    // markers across both leaves, including batch-boundary-ish keys
    val dels = Set(0L, 1L, 4095L, 4096L, 4999L, 5000L, 9999L)
    table.deleteKeys(dels.toSeq.toDF("id"))
    val df = spark.read.format("graft").load(dir).select("id", "v")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"tombstoned single-file leaves must stay on the columnar path:\n$plan")
    assert(df.select("id").as[Long].collect().toSet == (0L until 10000L).toSet -- dels)
    // re-ingest after the delete: newer generation survives the marker,
    // and the anti-join on the OLD file still drops the old rows
    table.ingest(Seq((4096L, 99999L)).toDF("id", "v"))
    val got = spark.read.format("graft").load(dir)
      .select("id", "v").as[(Long, Long)].collect().toMap
    assert(got(4096L) == 99999L && !got.contains(4095L))
    // a projection WITHOUT the row keys declines native (row path reads
    // keys internally) but stays correct
    val vOnly = spark.read.format("graft").load(dir).select("v")
    assert(vOnly.as[Long].collect().toSet ==
      ((0L until 10000L).toSet -- dels) + 99999L)
  }

  test("deletes on an aggregated table remove the key entirely (pre-agg anti-join)") {
    val dir = tmp()
    val aggSchema = GraftSchema(Seq(GraftField("id", LongType)), Nil,
      Seq(GraftField("v", LongType, nullable = false)))
    val table = GraftTable.create(spark, dir, aggSchema,
      config = TableConfig(aggregationConfig = "sum(v)"))
    table.ingest((0L until 10L).map(i => (i, 1L)).toDF("id", "v"))
    table.ingest((0L until 10L).map(i => (i, 1L)).toDF("id", "v"))
    table.deleteKeys(Seq(3L).toDF("id"))
    val rows = table.toDF.as[(Long, Long)].collect().toMap
    assert(!rows.contains(3L) && rows(4L) == 2L)
  }

  test("a partial strategy job never retires tombstones it could not fully apply") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    (0 until 3).foreach(b =>
      table.ingest((0L until 30L).filter(_ % 3 == b).map(i => (i, i)).toDF("id", "v")))
    table.deleteKeys(Seq(4L).toDF("id"))
    // ONE job over 2 of the leaf's 3 files: a genuinely partial merge
    val leaf = table.store.fileReferences.head.partitionId
    val twoFiles = table.store.fileReferences.filter(_.partitionId == leaf).take(2)
    new graft.jobs.Compaction(table).run(graft.jobs.CompactionJob(leaf, twoFiles))
    assert(table.store.tombstones.nonEmpty,
      "a partial job must leave the tombstone pending")
    assert(table.toDF.select("id").as[Long].collect().toSet ==
      (0L until 30L).toSet - 4L)
    // the follow-up whole-leaf compaction retires it
    table.compactAll()
    assert(table.store.tombstones.isEmpty)
    assert(table.toDF.select("id").as[Long].collect().toSet ==
      (0L until 30L).toSet - 4L)
  }

  test("a key re-ingested after a delete survives the pending tombstone (LSM semantics)") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L))
    table.ingest((0L until 100L).map(i => (i, i)).toDF("id", "v"))          // gen 1
    table.deleteKeys(Seq(5L, 6L, 77L).toDF("id"))                           // gen 2
    table.ingest(Seq((5L, 555L), (77L, 777L)).toDF("id", "v"))              // gen 3
    assert(table.store.tombstones.forall(_.seq == 2L), "tombstone carries its generation")

    val expect = ((0L until 100L).toSet -- Set(5L, 6L, 77L)).map(i => i -> i).toMap +
      (5L -> 555L) + (77L -> 777L)
    // pending window: the newer generation shadows the delete marker
    assert(table.toDF.select("id", "v").as[(Long, Long)].collect().toMap == expect,
      "query path while the tombstone is pending")
    assert(spark.read.format("graft").load(dir)
      .select("id", "v").as[(Long, Long)].collect().toMap == expect,
      "DSv2 merge path while the tombstone is pending")
    assert(table.lookup(5L).count() == 1 && table.lookup(6L).count() == 0)

    // compaction applies the marker only to generations <= its own,
    // retires it, and converges to the same rows
    table.compactAll()
    assert(table.store.tombstones.isEmpty)
    assert(table.toDF.select("id", "v").as[(Long, Long)].collect().toMap == expect)
    assert(spark.read.format("graft").load(dir)
      .select("id", "v").as[(Long, Long)].collect().toMap == expect)
  }

  test("purge=true closes the re-ingest window in one call") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((0L until 10L).map(i => (i, i)).toDF("id", "v"))
    table.deleteKeys(Seq(5L).toDF("id"), purge = true)
    assert(table.store.tombstones.isEmpty)
    // re-ingesting the key is now safe
    table.ingest(Seq((5L, 555L)).toDF("id", "v"))
    assert(table.toDF.filter($"id" === 5L).select("v").as[Long].head() == 555L)
  }

  test("tombstones persist through the log; time travel shows pre-delete rows") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((0L until 10L).map(i => (i, i)).toDF("id", "v"))
    val vBefore = graft.meta.JsonStateStore.load(s"$dir/meta").currentVersion
    table.deleteKeys(Seq(2L).toDF("id"))

    val reloaded = GraftTable.load(spark, dir)
    assert(reloaded.store.tombstones.size == 1)
    assert(reloaded.toDF.select("id").as[Long].collect().toSet == (0L until 10L).toSet - 2L)
    val old = GraftTable.loadAsOf(spark, dir, vBefore)
    assert(old.toDF.select("id").as[Long].collect().toSet == (0L until 10L).toSet)
  }
}
