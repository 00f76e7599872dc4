package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** SQL time travel + metadata tables + ALTER TABLE through the catalog:
  * `VERSION AS OF` / `TIMESTAMP AS OF` pin a read-only historical view;
  * `$files` / `$partitions` / `$tombstones` / `$history` expose the
  * state store as queryable relations; ADD COLUMN runs m11 schema
  * evolution from SQL.
  */
class SqlTimeTravelSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val root = {
    val r = Files.createTempDirectory("graft-sqltt").toString
    spark.conf.set("spark.sql.catalog.gt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gt.root", r)
    r
  }

  private var n = 0
  private def mk(agg: String = ""): String = {
    root; n += 1
    val t = s"tt$n"
    val aggProp = if (agg.isEmpty) "" else s", 'aggregation'='$agg'"
    spark.sql(
      s"""CREATE TABLE gt.$t (id BIGINT, v BIGINT NOT NULL) USING graft
         |TBLPROPERTIES('rowKeys'='id', 'splitPoints'='50'$aggProp)""".stripMargin)
    t
  }

  private def version(t: String): Long =
    graft.meta.JsonStateStore.load(s"$root/$t/meta").currentVersion

  test("VERSION AS OF serves the pinned state; the live table moves on") {
    val t = mk("last(v)")
    spark.sql(s"INSERT INTO gt.$t SELECT id, id FROM range(0, 100)")
    val v1 = version(t)
    spark.sql(s"INSERT INTO gt.$t SELECT id, id + 1000 FROM range(0, 50)")
    spark.sql(s"DELETE FROM gt.$t WHERE id = 99")

    val old = spark.sql(s"SELECT id, v FROM gt.$t VERSION AS OF $v1")
      .as[(Long, Long)].collect().toMap
    assert(old == (0L until 100L).map(i => i -> i).toMap, "pinned view: pre-update state")

    val now = spark.sql(s"SELECT id, v FROM gt.$t").as[(Long, Long)].collect().toMap
    assert(now.size == 99 && now(0L) == 1000L && !now.contains(99L), "live view moved on")

    // pinned views are read-only
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO gt.$t VERSION AS OF $v1 VALUES (7, 7)")
    }
    assert(e.getMessage != null)
  }

  test("TIMESTAMP AS OF resolves to the newest commit at or before t") {
    val t = mk()
    spark.sql(s"INSERT INTO gt.$t SELECT id, id FROM range(0, 10)")
    val afterFirst = System.currentTimeMillis()
    Thread.sleep(1100) // fs mtime granularity can be a full second
    spark.sql(s"INSERT INTO gt.$t SELECT id, id FROM range(10, 20)")

    val ts = new java.sql.Timestamp(afterFirst)
    val cnt = spark.sql(
      s"SELECT count(*) FROM gt.$t TIMESTAMP AS OF '$ts'").as[Long].head()
    assert(cnt == 10L, s"expected the first commit's 10 rows, got $cnt")
    // a timestamp before the table existed is refused
    intercept[Exception] {
      spark.sql(s"SELECT * FROM gt.$t TIMESTAMP AS OF '1999-01-01 00:00:00'").collect()
    }
  }

  test("TIMESTAMP AS OF survives a file copy (mtimes destroyed)") {
    val t = mk()
    spark.sql(s"INSERT INTO gt.$t SELECT id, id FROM range(0, 10)")
    val afterFirst = System.currentTimeMillis()
    Thread.sleep(50) // commit ts is persisted in the record — no mtime granularity wait
    spark.sql(s"INSERT INTO gt.$t SELECT id, id FROM range(10, 20)")

    // copy the whole table to a new directory and SCRAMBLE every mtime:
    // commit times must come from the persisted ts field, not the fs
    val src = java.nio.file.Paths.get(s"$root/$t")
    val dst = Files.createTempDirectory("graft-ttcopy").resolve("t")
    import scala.jdk.CollectionConverters._
    Files.walk(src).iterator().asScala.foreach { p =>
      val q = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(q)
      else Files.copy(p, q)
    }
    // reverse the mtime order entirely (newest commit gets the oldest mtime)
    val metaFiles = new java.io.File(s"$dst/meta").listFiles().sortBy(_.getName)
    metaFiles.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(1000000000000L - i * 60000L)
    }

    val v = graft.meta.JsonStateStore.versionAtOrBefore(s"$dst/meta", afterFirst)
    assert(v.isDefined, "timestamp must resolve on the copied table")
    val pinned = graft.meta.JsonStateStore.loadAt(s"$dst/meta", v.get)
    assert(pinned.fileReferences.map(_.rowCount).sum == 10L,
      s"copied-table TIMESTAMP AS OF must see the first commit only (v=$v)")
    // and $history-style commit times stay monotone on the copy
    val times = graft.meta.JsonStateStore.retainedVersionsIn(s"$dst/meta").map(_._2)
    assert(times == times.sorted, s"persisted commit times must be monotone: $times")
  }

  test("metadata tables: $files, $partitions, $tombstones, $history") {
    val t = mk()
    spark.sql(s"INSERT INTO gt.$t SELECT id, id FROM range(0, 100)")
    spark.sql(s"INSERT INTO gt.$t SELECT id, id FROM range(100, 120)")
    spark.sql(s"DELETE FROM gt.$t WHERE id = 5")

    val files = spark.sql(
      s"SELECT partition_id, row_count, seq FROM gt.`$t$$files`")
    // two ingests over two leaves (split at 50): first spans both, the
    // second (100..119) lands in the upper leaf only
    assert(files.count() == 3)
    assert(files.agg(org.apache.spark.sql.functions.sum("row_count"))
      .head().getLong(0) == 120L)
    assert(files.select("seq").as[Long].collect().toSet == Set(1L, 2L))

    val parts = spark.sql(
      s"SELECT id, is_leaf, file_count, row_estimate, tombstone_count " +
        s"FROM gt.`$t$$partitions` WHERE is_leaf").collect()
    assert(parts.length == 2)
    assert(parts.map(_.getLong(3)).sum == 120L)
    assert(parts.map(_.getLong(4)).sum == 1L, "one pending tombstone")

    val tombs = spark.sql(s"SELECT row_count FROM gt.`$t$$tombstones`").as[Long].collect()
    assert(tombs.toSeq == Seq(1L))

    val hist = spark.sql(
      s"SELECT version, committed_at, operation FROM gt.`$t$$history` ORDER BY version")
      .collect()
    assert(hist.map(_.getLong(0)).toSeq == (1L to version(t)).toSeq)
    assert(hist.forall(_.getTimestamp(1) != null))
    assert(hist.map(_.getString(2)).toSeq ==
      Seq("create", "addFiles", "addFiles", "addTombstones"))

    // history versions round-trip through VERSION AS OF
    val v2 = hist(1).getLong(0) // after the first insert
    assert(spark.sql(s"SELECT count(*) FROM gt.$t VERSION AS OF $v2")
      .as[Long].head() == 100L)
  }

  test("ALTER TABLE ADD COLUMN: SQL schema evolution, old rows null-fill") {
    val t = mk()
    spark.sql(s"INSERT INTO gt.$t SELECT id, id FROM range(0, 10)")
    spark.sql(s"ALTER TABLE gt.$t ADD COLUMN extra BIGINT")
    spark.sql(s"INSERT INTO gt.$t SELECT id, id, id * 2 FROM range(10, 20)")

    val got = spark.sql(s"SELECT id, v, extra FROM gt.$t ORDER BY id")
      .as[(Long, Long, Option[Long])].collect()
    assert(got.length == 20)
    assert(got.take(10).forall(_._3.isEmpty), "pre-evolution rows null-fill")
    assert(got.drop(10).forall(r => r._3.contains(r._1 * 2)))

    // time travel to before the change shows the OLD schema
    val hist = spark.sql(s"SELECT version FROM gt.`$t$$history` ORDER BY version")
      .as[Long].collect()
    val preAlter = hist(1) // v1 create, v2 first insert, v3 alter
    assert(spark.sql(s"SELECT * FROM gt.$t VERSION AS OF $preAlter").columns.toSeq ==
      Seq("id", "v"))

    // guards: non-nullable and key-conflicting changes are refused
    intercept[Exception] {
      spark.sql(s"ALTER TABLE gt.$t ADD COLUMN bad BIGINT NOT NULL")
    }
    // value columns DROP via column mapping (metadata-only); keys never
    intercept[Exception] { spark.sql(s"ALTER TABLE gt.$t DROP COLUMN id") }
    spark.sql(s"ALTER TABLE gt.$t DROP COLUMN v")
    assert(!spark.table(s"gt.$t").columns.contains("v"))
    // aggregation-configured tables refuse (config must cover all values)
    val ta = mk("sum(v)")
    spark.sql(s"INSERT INTO gt.$ta SELECT id, id FROM range(0, 5)")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE gt.$ta ADD COLUMN extra BIGINT")
    }
  }
}
