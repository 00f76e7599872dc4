package graft.table

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Deep clone at a version: exact state reproduction (tree, refs with
  * write-generation seqs, pending delete markers, txn watermarks,
  * config) and full physical independence from the source's lifecycle.
  */
class CloneSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("id", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType, nullable = false)))

  private def tmp() = Files.createTempDirectory("graft-clone").toString

  private def readMap(t: GraftTable): Map[Long, Long] =
    t.toDF.select("id", "v").as[(Long, Long)].collect().toMap

  test("cloneAt reproduces the captured version; later source mutations never leak") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L),
      config = TableConfig(aggregationConfig = "last(v)"))
    table.ingest((0L until 100L).map(i => (i, i)).toDF("id", "v"))          // gen 1
    table.ingest((0L until 100L by 2).map(i => (i, i + 1000L)).toDF("id", "v")) // gen 2
    table.deleteKeys(Seq(9L, 18L).toDF("id"))                               // pending markers
    val v = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion

    val dest = tmp() + "/clone"
    val clone = table.cloneAt(dest, v)
    val expectAtV = (0L until 100L).filterNot(i => i == 9L || i == 18L)
      .map(i => i -> (if (i % 2 == 0) i + 1000L else i)).toMap
    assert(readMap(clone) == expectAtV, "clone == the captured version")
    // markers, seqs, and config crossed over
    assert(clone.store.tombstones.size == table.store.tombstones.size)
    assert(clone.store.fileReferences.map(_.seq).toSet ==
      table.store.fileReferences.map(_.seq).toSet)
    assert(clone.config.aggregationConfig == "last(v)")

    // source moves on: a third generation, more deletes, compaction, GC
    table.ingest((0L until 100L by 5).map(i => (i, i + 9000L)).toDF("id", "v"))
    table.deleteKeys(Seq(1L).toDF("id"))
    table.compactAll()
    table.collectGarbage(nowMs = System.currentTimeMillis() + 11L * 60 * 1000)
    assert(readMap(clone) == expectAtV,
      "source compaction + GC must not affect the clone (deep copy)")

    // clone moves on: its own writes and lifecycle, invisible to the source
    clone.ingest(Seq((0L, 77L)).toDF("id", "v"))
    clone.compactAll()
    assert(clone.store.tombstones.isEmpty, "clone compaction retires ITS markers")
    clone.collectGarbage(nowMs = System.currentTimeMillis() + 11L * 60 * 1000)
    assert(readMap(clone) == expectAtV + (0L -> 77L))
    val srcExpect = readMap(table)
    assert(!srcExpect.get(0L).contains(77L), "clone writes never leak back")
    // DSv2 reads work against the clone directory like any table
    assert(spark.read.format("graft").load(dest)
      .select("id", "v").as[(Long, Long)].collect().toMap == expectAtV + (0L -> 77L))
  }

  test("clone carries streaming txn watermarks; refuses an occupied destination") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    assert(table.store.asInstanceOf[graft.meta.JsonStateStore]
      .addFilesIfAbsent("stream-z", 7L, Seq(graft.meta.FileReference("zzz", "root", 1))) ||
      true) // ref file need not exist for the watermark check below
    val v = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    val dest = tmp() + "/clone"
    intercept[Exception] { // the fake file cannot be copied — use a real one
      table.cloneAt(dest, v)
    }

    val dir2 = tmp()
    val t2 = GraftTable.create(spark, dir2, schema)
    t2.ingest(Seq((1L, 1L)).toDF("id", "v"),
      txn = Some(("stream-w", 5L)))
    val v2 = t2.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    val dest2 = tmp() + "/clone"
    val c2 = t2.cloneAt(dest2, v2)
    assert(c2.store.lastTxnVersion("stream-w").contains(5L),
      "a replayed streaming batch against the clone must still deduplicate")
    // occupied destination refused
    intercept[IllegalArgumentException] { t2.cloneAt(dest2, v2) }
  }
}
