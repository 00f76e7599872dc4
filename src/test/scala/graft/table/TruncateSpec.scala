package graft.table

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.meta.JsonStateStore

/** TRUNCATE + atomic INSERT OVERWRITE: one O(1) metadata version,
  * all-or-nothing replacement, GC collection of the orphans, and
  * time travel to pre-truncate state.
  */
class TruncateSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  private def tmp() = Files.createTempDirectory("graft-trunc").toString

  test("truncate drops rows in one version; time travel still reads; GC collects") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L),
      config = TableConfig(gcDelayMinutes = 0))
    table.ingest((1L to 100L).map(i => (i, i)).toDF("k", "v"))
    table.deleteKeys(Seq(7L).toDF("k")) // a pending marker truncates too
    val vBefore = JsonStateStore.load(s"$dir/meta").currentVersion

    table.truncate()
    val st = JsonStateStore.load(s"$dir/meta")
    assert(st.currentVersion == vBefore + 1, "one metadata version")
    assert(st.fileReferences.isEmpty && st.tombstones.isEmpty)
    assert(table.toDF.count() == 0)
    assert(st.unreferencedFiles.size == 3, "2 leaf files + 1 marker queued for GC")

    // pre-truncate version reads everything (marker applied: 99 rows)
    assert(GraftTable.loadAsOf(spark, dir, vBefore).toDF.count() == 99)

    new graft.jobs.GarbageCollector(table).run()
    assert(JsonStateStore.load(s"$dir/meta").unreferencedFiles.isEmpty)
    assert(graft.meta.GraftFS.list(s"$dir/data").forall(d =>
      graft.meta.GraftFS.list(d.getPath.toString).isEmpty), "files physically gone")
  }

  test("overwrite replaces contents in ONE atomic version") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L))
    table.ingest((1L to 60L).map(i => (i, i)).toDF("k", "v"))
    val v1 = JsonStateStore.load(s"$dir/meta").currentVersion

    table.overwrite((200L to 210L).map(i => (i, i * 2)).toDF("k", "v"))
    val st = JsonStateStore.load(s"$dir/meta")
    assert(st.currentVersion == v1 + 1, "truncate+add = one composite version")
    assert(table.toDF.select("k").as[Long].collect().toSet == (200L to 210L).toSet)
    // old contents at the old version; new generation restarts seqs safely
    assert(GraftTable.loadAsOf(spark, dir, v1).toDF.count() == 60)
  }

  test("SQL: TRUNCATE TABLE and INSERT OVERWRITE through the catalog") {
    val root = Files.createTempDirectory("graft-trunc-sql").toString
    spark.conf.set("spark.sql.catalog.gtr", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtr.root", root)
    spark.sql(
      """CREATE TABLE gtr.t (k BIGINT, v BIGINT) USING graft
        |TBLPROPERTIES('rowKeys'='k', 'splitPoints'='50')""".stripMargin)
    spark.sql("INSERT INTO gtr.t SELECT id, id FROM range(1, 101)")
    assert(spark.sql("SELECT count(*) FROM gtr.t").as[Long].head() == 100L)

    val v1 = JsonStateStore.load(s"$root/t/meta").currentVersion
    spark.sql("INSERT OVERWRITE gtr.t SELECT id, id * 3 FROM range(500, 510)")
    val st = JsonStateStore.load(s"$root/t/meta")
    assert(st.currentVersion == v1 + 1, "INSERT OVERWRITE is one atomic version")
    assert(spark.sql("SELECT sum(v) FROM gtr.t").as[Long].head() ==
      (500L until 510L).map(_ * 3).sum)

    spark.sql("TRUNCATE TABLE gtr.t")
    assert(spark.sql("SELECT count(*) FROM gtr.t").as[Long].head() == 0L)
    // and the table keeps working after
    spark.sql("INSERT INTO gtr.t VALUES (1, 1)")
    assert(spark.sql("SELECT count(*) FROM gtr.t").as[Long].head() == 1L)
  }
}
