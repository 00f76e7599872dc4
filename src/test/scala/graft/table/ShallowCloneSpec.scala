package graft.table

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.meta.GraftFS

/** Shallow (zero-copy) clone: the branch references the source's data
  * files by absolute path — O(metadata) regardless of data size — and
  * the two lifecycles never touch each other's bytes in the directions
  * the contract promises (clone ops never delete source files; source
  * files inherited by the clone survive the clone's compaction + GC).
  */
class ShallowCloneSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("id", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType, nullable = false)))

  private def tmp() = Files.createTempDirectory("graft-sclone").toString

  private def readMap(t: GraftTable): Map[Long, Long] =
    t.toDF.select("id", "v").as[(Long, Long)].collect().toMap

  private def dataFiles(dir: String): Set[String] = {
    val d = java.nio.file.Paths.get(dir, "data")
    if (!Files.exists(d)) Set.empty
    else {
      val s = Files.walk(d)
      try {
        val it = s.iterator()
        val b = Set.newBuilder[String]
        while (it.hasNext) {
          val p = it.next()
          if (p.toString.endsWith(".parquet")) b += p.toString
        }
        b.result()
      } finally s.close()
    }
  }

  test("shallowCloneAt is zero-copy, exact, and lifecycle-isolated") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L),
      config = TableConfig(aggregationConfig = "last(v)"))
    table.ingest((0L until 100L).map(i => (i, i)).toDF("id", "v"))              // gen 1
    table.ingest((0L until 100L by 2).map(i => (i, i + 1000L)).toDF("id", "v")) // gen 2
    table.deleteKeys(Seq(9L, 18L).toDF("id"))                                   // pending markers
    val v = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    val srcFiles = dataFiles(dir)
    assert(srcFiles.nonEmpty)

    val dest = tmp() + "/branch"
    val clone = table.shallowCloneAt(dest, v)

    // zero-copy: the clone owns NO parquet bytes, only metadata
    assert(dataFiles(dest).isEmpty, "shallow clone must not copy data files")
    // every inherited ref is an absolute path into the source
    assert(clone.store.fileReferences.forall(r => GraftFS.isExternalName(r.filename)))
    assert(clone.store.tombstones.forall(r => GraftFS.isExternalName(r.filename)))

    val expectAtV = (0L until 100L).filterNot(i => i == 9L || i == 18L)
      .map(i => i -> (if (i % 2 == 0) i + 1000L else i)).toMap
    assert(readMap(clone) == expectAtV, "clone == the captured version")
    assert(clone.config.aggregationConfig == "last(v)")
    // DSv2 read path resolves external names too
    assert(spark.read.format("graft").load(dest)
      .select("id", "v").as[(Long, Long)].collect().toMap == expectAtV)

    // clone moves on: its own generation, compaction (rewrites inherited
    // data locally), and GC — none of which may delete a source byte
    clone.ingest(Seq((0L, 77L)).toDF("id", "v"))
    clone.compactAll()
    assert(clone.store.tombstones.isEmpty, "clone compaction retires ITS markers")
    val gone = clone.collectGarbage(nowMs = System.currentTimeMillis() + 11L * 60 * 1000)
    assert(gone.nonEmpty, "replaced external refs must clear from the GC queue")
    assert(srcFiles.forall(f => Files.exists(java.nio.file.Paths.get(f))),
      "clone GC must never delete the source's files")
    assert(readMap(clone) == expectAtV + (0L -> 77L))
    // after compaction the clone is self-contained: all refs local
    assert(clone.store.fileReferences.forall(r => !GraftFS.isExternalName(r.filename)))
    assert(dataFiles(dest).nonEmpty)

    // source unaffected throughout
    assert(readMap(table) == expectAtV)

    // source moves on; the clone's pinned read is unchanged (no source
    // GC ran, which is the documented retention contract)
    table.ingest((0L until 100L by 5).map(i => (i, i + 9000L)).toDF("id", "v"))
    assert(readMap(clone) == expectAtV + (0L -> 77L))
  }

  test("deep clone of a shallow clone localizes the inherited refs") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(aggregationConfig = "last(v)"))
    table.ingest((0L until 20L).map(i => (i, i)).toDF("id", "v"))
    table.deleteKeys(Seq(3L).toDF("id"))
    val v = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    val sc = table.shallowCloneAt(tmp() + "/sc", v)
    val scV = sc.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    val deepDir = tmp() + "/deep"
    val deep = sc.shallowCloneAt(tmp() + "/unused", scV) // keep sc pristine
    val dc = sc.cloneAt(deepDir, scV)
    // fully independent: every ref is a plain local name with real bytes
    assert(dc.store.fileReferences.forall(r => !GraftFS.isExternalName(r.filename)))
    assert(dc.store.tombstones.forall(r => !GraftFS.isExternalName(r.filename)))
    assert(dataFiles(deepDir).nonEmpty, "deep clone owns its own parquet bytes")
    val expect = (0L until 20L).filterNot(_ == 3L).map(i => i -> i).toMap
    assert(readMap(dc) == expect)
    assert(readMap(deep) == expect)
  }

  test("clone-of-clone keeps pointing at the ORIGINAL owner") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((0L until 10L).map(i => (i, i)).toDF("id", "v"))
    val v = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    val c1 = table.shallowCloneAt(tmp() + "/c1", v)
    val v1 = c1.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    val c2 = c1.shallowCloneAt(tmp() + "/c2", v1)
    // c2's refs are the SAME absolute paths as c1's (no double hop)
    assert(c2.store.fileReferences.map(_.filename).toSet ==
      c1.store.fileReferences.map(_.filename).toSet)
    assert(readMap(c2) == (0L until 10L).map(i => i -> i).toMap)
  }
}
