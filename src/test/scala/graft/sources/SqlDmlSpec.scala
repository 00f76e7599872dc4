package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** SQL row-level DML through the catalog: metadata-only exact-key
  * DELETE, scan-based predicate DELETE, UPDATE as delete+reinsert, and
  * atomic MERGE INTO — all landing on the LSM primitives (tombstones +
  * one merge commit), zero data rewrite.
  */
class SqlDmlSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val root = {
    val r = Files.createTempDirectory("graft-sqldml").toString
    spark.conf.set("spark.sql.catalog.gd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gd.root", r)
    r
  }

  private var n = 0
  private def mkLww(): String = {
    root; n += 1
    val t = s"t$n"
    spark.sql(
      s"""CREATE TABLE gd.$t (id BIGINT, v BIGINT NOT NULL) USING graft
         |TBLPROPERTIES('rowKeys'='id', 'splitPoints'='50',
         |              'aggregation'='last(v)')""".stripMargin)
    spark.sql(s"INSERT INTO gd.$t SELECT id, id * 10 FROM range(0, 100)")
    t
  }

  private def readMap(t: String): Map[Long, Long] =
    spark.sql(s"SELECT id, v FROM gd.$t").as[(Long, Long)].collect().toMap

  test("exact-key DELETE is metadata-only: tombstones, no new data files") {
    val t = mkLww()
    val dir = s"$root/$t"
    val filesBefore = graft.table.GraftTable.load(spark, dir).store.fileReferences.size
    spark.sql(s"DELETE FROM gd.$t WHERE id = 5")
    spark.sql(s"DELETE FROM gd.$t WHERE id IN (6, 7)")
    val store = graft.meta.JsonStateStore.load(s"$dir/meta")
    assert(store.fileReferences.size == filesBefore, "no data files written")
    assert(store.tombstones.nonEmpty, "deletes landed as tombstones")
    val got = readMap(t)
    assert(!got.contains(5L) && !got.contains(6L) && !got.contains(7L))
    assert(got.size == 97 && got(8L) == 80L)
  }

  test("multi-key conjunction and OR-of-keys DELETE stay metadata-only") {
    root
    spark.sql(
      """CREATE TABLE gd.mk (a BIGINT, b STRING, v BIGINT NOT NULL) USING graft
        |TBLPROPERTIES('rowKeys'='a,b', 'aggregation'='last(v)')""".stripMargin)
    spark.sql("INSERT INTO gd.mk VALUES (1,'x',1), (1,'y',2), (2,'x',3)")
    spark.sql("DELETE FROM gd.mk WHERE a = 1 AND b = 'x'")
    spark.sql("DELETE FROM gd.mk WHERE (a = 1 AND b = 'y') OR (a = 9 AND b = 'q')")
    val store = graft.meta.JsonStateStore.load(s"$root/mk/meta")
    assert(store.tombstones.nonEmpty)
    val got = spark.sql("SELECT a, b, v FROM gd.mk").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((2L, "x", 3L)))
  }

  test("predicate DELETE takes the scan-based row-level path") {
    val t = mkLww()
    spark.sql(s"DELETE FROM gd.$t WHERE v >= 900")
    val got = readMap(t)
    assert(got.size == 90 && got.values.forall(_ < 900))
    // deleted keys landed as tombstones, not rewritten files
    val store = graft.meta.JsonStateStore.load(s"$root/$t/meta")
    assert(store.tombstones.nonEmpty)
    // a later insert of a deleted key survives (generation-aware markers)
    spark.sql(s"INSERT INTO gd.$t VALUES (95, 12345)")
    assert(readMap(t)(95L) == 12345L)
  }

  test("UPDATE rewrites values via delete+reinsert in one atomic commit") {
    val t = mkLww()
    val dir = s"$root/$t"
    val vBefore = graft.meta.JsonStateStore.load(s"$dir/meta")
      .asInstanceOf[graft.meta.JsonStateStore].currentVersion
    spark.sql(s"UPDATE gd.$t SET v = v + 1 WHERE id < 10")
    val store = graft.meta.JsonStateStore.load(s"$dir/meta")
    assert(store.currentVersion == vBefore + 1, "one commit for the whole statement")
    val got = readMap(t)
    assert((0L until 10L).forall(i => got(i) == i * 10 + 1))
    assert((10L until 100L).forall(i => got(i) == i * 10))
  }

  test("MERGE INTO: update, insert, and delete clauses in one statement") {
    val t = mkLww()
    spark.sql(
      s"""MERGE INTO gd.$t AS tgt
         |USING (SELECT id, id * 100 AS nv,
         |              CASE WHEN id % 2 = 0 THEN 'del' ELSE 'put' END AS op
         |       FROM range(95, 105)) AS src
         |ON tgt.id = src.id
         |WHEN MATCHED AND src.op = 'del' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = src.nv
         |WHEN NOT MATCHED AND src.op = 'put' THEN INSERT (id, v) VALUES (src.id, src.nv)
         |""".stripMargin)
    val got = readMap(t)
    // matched evens (96, 98) deleted; matched odds (95..99) updated
    assert(!got.contains(96L) && !got.contains(98L))
    assert(got(95L) == 9500L && got(97L) == 9700L && got(99L) == 9900L)
    // unmatched odds inserted, unmatched evens skipped
    assert(got(101L) == 10100L && got(103L) == 10300L)
    assert(!got.contains(100L) && !got.contains(102L) && !got.contains(104L))
    assert(got(50L) == 500L, "untouched keys unchanged")
  }

  test("row-level DML is refused on tables without one-row-per-key semantics") {
    root
    spark.sql(
      """CREATE TABLE gd.plain (id BIGINT, v BIGINT) USING graft
        |TBLPROPERTIES('rowKeys'='id')""".stripMargin)
    spark.sql("INSERT INTO gd.plain VALUES (1, 1), (2, 2)")
    // exact-key DELETE works on any table (it IS the m13 contract)
    spark.sql("DELETE FROM gd.plain WHERE id = 1")
    assert(spark.sql("SELECT id FROM gd.plain").as[Long].collect().toSeq == Seq(2L))
    // predicate DELETE / UPDATE / MERGE need the row-level gate
    val e = intercept[Exception](spark.sql("DELETE FROM gd.plain WHERE v = 2"))
    assert(e.getMessage.contains("row-level"))
    intercept[Exception](spark.sql("UPDATE gd.plain SET v = 3 WHERE id = 2"))
  }

  test("SQL DML interoperates with the Scala API on the same table") {
    val t = mkLww()
    val table = graft.table.GraftTable.load(spark, s"$root/$t")
    table.deleteKeys(Seq(10L).toDF("id"))
    spark.sql(s"DELETE FROM gd.$t WHERE id = 11")
    spark.sql(s"UPDATE gd.$t SET v = 0 WHERE id = 12")
    // a table handle is a state snapshot — reload to see the SQL commits
    graft.table.GraftTable.load(spark, s"$root/$t").compactAll()
    val got = readMap(t)
    assert(!got.contains(10L) && !got.contains(11L) && got(12L) == 0L)
    assert(graft.meta.JsonStateStore.load(s"$root/$t/meta").tombstones.isEmpty,
      "compaction purged and retired the SQL-written tombstones")
  }
}
