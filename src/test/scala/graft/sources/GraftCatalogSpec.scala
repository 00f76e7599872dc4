package graft.sources

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-SQL lifecycle through the TableCatalog: CREATE TABLE with key
  * properties, INSERT INTO (full ingest dataflow), SELECT with pushdown,
  * SHOW TABLES, DROP TABLE — plus interchangeability with the Scala API.
  */
class GraftCatalogSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val root = {
    val r = Files.createTempDirectory("graft-catalog").toString
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.root", r)
    r
  }

  test("CREATE / INSERT / SELECT / SHOW / DROP round-trip in SQL") {
    root
    spark.sql(
      """CREATE TABLE gcat.events (key STRING, ts BIGINT, count BIGINT NOT NULL)
        |USING graft
        |TBLPROPERTIES('rowKeys'='key', 'sortKeys'='ts', 'splitPoints'='m',
        |              'aggregation'='sum(count)')""".stripMargin)
    assert(spark.sql("SHOW TABLES IN gcat").collect().map(_.getString(1)).contains("events"))

    spark.sql("INSERT INTO gcat.events VALUES ('a', 1, 10), ('z', 2, 20), ('a', 1, 5)")
    // key-equal continual aggregation applies on the read
    val got = spark.sql("SELECT key, ts, count FROM gcat.events ORDER BY key")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 15L), ("z", 2L, 20L)))

    // pushdown prunes to one leaf through the catalog path too
    val one = spark.sql("SELECT count FROM gcat.events WHERE key = 'z'")
    assert(one.as[Long].collect().toSeq == Seq(20L))

    // the SAME directory opens through the Scala API
    val table = graft.table.GraftTable.load(spark, s"$root/events")
    assert(table.metrics.rowCount == 3) // physical rows (not yet compacted)

    spark.sql("DROP TABLE gcat.events")
    assert(spark.sql("SHOW TABLES IN gcat").count() == 0)
    assert(!Files.exists(java.nio.file.Paths.get(root, "events")))
  }

  test("a mixed ALTER TABLE is atomic: one bad change commits nothing") {
    root
    spark.sql(
      """CREATE TABLE gcat.alt (key STRING, v BIGINT) USING graft
        |TBLPROPERTIES('rowKeys'='key')""".stripMargin)
    val cat = new GraftCatalog()
    cat.initialize("gcat", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("root", root)))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty[String], "alt")
    import org.apache.spark.sql.connector.catalog.TableChange
    def schemaNow(): Seq[String] =
      graft.meta.JsonStateStore.load(s"$root/alt/meta").schema.allFields.map(_.name)

    // AddColumn followed by an INVALID change (dropping a KEY column):
    // nothing may land
    intercept[Exception] {
      cat.alterTable(ident,
        TableChange.addColumn(Array("extra"), org.apache.spark.sql.types.LongType),
        TableChange.deleteColumn(Array("key"), false))
    }
    assert(schemaNow() == Seq("key", "v"), "partial ALTER must not commit the add")

    // AddColumn followed by an INVALID property: nothing may land
    intercept[Exception] {
      cat.alterTable(ident,
        TableChange.addColumn(Array("extra"), org.apache.spark.sql.types.LongType),
        TableChange.setProperty("bogus", "x"))
    }
    assert(schemaNow() == Seq("key", "v"))
    intercept[Exception] {
      cat.alterTable(ident,
        TableChange.addColumn(Array("extra"), org.apache.spark.sql.types.LongType),
        TableChange.setProperty("filter", "ageOff(nosuchcol,1)"))
    }
    assert(schemaNow() == Seq("key", "v"))

    // a property referencing the ADDED column validates against the
    // post-add schema and the whole statement lands
    cat.alterTable(ident,
      TableChange.addColumn(Array("extra"), org.apache.spark.sql.types.LongType),
      TableChange.setProperty("index", "bloom(extra)"))
    assert(schemaNow() == Seq("key", "v", "extra"))
    assert(graft.meta.JsonStateStore.load(s"$root/alt/meta").indexConfig == "bloom(extra)")
  }

  test("CREATE TABLE validates key properties and configs at DDL time") {
    root
    intercept[Exception](spark.sql(
      "CREATE TABLE gcat.bad (key STRING, v BIGINT) USING graft"))
    intercept[Exception](spark.sql(
      """CREATE TABLE gcat.bad2 (key STRING, v BIGINT) USING graft
        |TBLPROPERTIES('rowKeys'='nope')""".stripMargin))
    // nullable aggregated field rejected at CREATE, not at first ingest
    intercept[Exception](spark.sql(
      """CREATE TABLE gcat.bad3 (key STRING, v BIGINT) USING graft
        |TBLPROPERTIES('rowKeys'='key', 'aggregation'='sum(v)')""".stripMargin))
    // keys not declared first would silently swap positional INSERTs
    intercept[Exception](spark.sql(
      """CREATE TABLE gcat.bad4 (v BIGINT, key STRING) USING graft
        |TBLPROPERTIES('rowKeys'='key')""".stripMargin))
    Seq("bad", "bad2", "bad3", "bad4").foreach { n =>
      assert(!Files.exists(java.nio.file.Paths.get(root, n)) ||
        !Files.exists(java.nio.file.Paths.get(root, n, "meta")),
        s"failed CREATE must not leave table $n behind")
    }
  }

  private def stagingLeftovers(): Seq[String] = {
    val p = java.nio.file.Paths.get(root, ".staging")
    if (!Files.exists(p)) Nil
    else {
      val s = Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString).toList finally s.close()
    }
  }

  test("CTAS is atomic: success publishes, failure leaves nothing") {
    root
    Seq(("a", 1L), ("m", 2L), ("z", 3L)).toDF("key", "v")
      .createOrReplaceTempView("ctas_src")
    spark.sql(
      """CREATE TABLE gcat.ctas USING graft
        |TBLPROPERTIES('rowKeys'='key', 'splitPoints'='m')
        |AS SELECT key, v FROM ctas_src""".stripMargin)
    assert(spark.sql("SELECT key, v FROM gcat.ctas ORDER BY key")
      .as[(String, Long)].collect().toSeq ==
      Seq(("a", 1L), ("m", 2L), ("z", 3L)))
    assert(stagingLeftovers().isEmpty, "committed CTAS must clean .staging")

    // a SELECT that fails mid-write must leave no table AND no scratch dir
    spark.udf.register("ctas_boom", (x: Long) =>
      if (x >= 0) throw new RuntimeException("boom") else x)
    intercept[Exception](spark.sql(
      """CREATE TABLE gcat.ctas_fail USING graft
        |TBLPROPERTIES('rowKeys'='key')
        |AS SELECT key, ctas_boom(v) AS v FROM ctas_src""".stripMargin))
    assert(!Files.exists(java.nio.file.Paths.get(root, "ctas_fail")),
      "failed CTAS must not publish a table")
    assert(stagingLeftovers().isEmpty, "failed CTAS must delete its scratch home")
    // the name stays fully usable afterwards
    spark.sql(
      """CREATE TABLE gcat.ctas_fail USING graft TBLPROPERTIES('rowKeys'='key')
        |AS SELECT key, v FROM ctas_src WHERE key = 'a'""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM gcat.ctas_fail").as[Long].head() == 1L)
    spark.sql("DROP TABLE gcat.ctas_fail")
  }

  test("RTAS swaps atomically and a failed RTAS keeps the old table") {
    root
    Seq(("a", 1L), ("b", 2L)).toDF("key", "v").createOrReplaceTempView("rtas_src")
    spark.sql(
      """CREATE TABLE gcat.rtas USING graft TBLPROPERTIES('rowKeys'='key')
        |AS SELECT key, v FROM rtas_src""".stripMargin)
    spark.sql(
      """REPLACE TABLE gcat.rtas USING graft TBLPROPERTIES('rowKeys'='key')
        |AS SELECT key, v * 10 AS v FROM rtas_src""".stripMargin)
    assert(spark.sql("SELECT key, v FROM gcat.rtas ORDER BY key")
      .as[(String, Long)].collect().toSeq == Seq(("a", 10L), ("b", 20L)))

    spark.udf.register("rtas_boom", (x: Long) =>
      if (x >= 0) throw new RuntimeException("boom") else x)
    intercept[Exception](spark.sql(
      """REPLACE TABLE gcat.rtas USING graft TBLPROPERTIES('rowKeys'='key')
        |AS SELECT key, rtas_boom(v) AS v FROM rtas_src""".stripMargin))
    // old contents untouched by the failed replace
    assert(spark.sql("SELECT key, v FROM gcat.rtas ORDER BY key")
      .as[(String, Long)].collect().toSeq == Seq(("a", 10L), ("b", 20L)))
    assert(stagingLeftovers().isEmpty)

    // REPLACE refuses a missing table; CREATE OR REPLACE accepts it
    intercept[Exception](spark.sql(
      """REPLACE TABLE gcat.rtas_missing USING graft TBLPROPERTIES('rowKeys'='key')
        |AS SELECT key, v FROM rtas_src""".stripMargin))
    spark.sql(
      """CREATE OR REPLACE TABLE gcat.rtas_missing USING graft
        |TBLPROPERTIES('rowKeys'='key')
        |AS SELECT key, v FROM rtas_src""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM gcat.rtas_missing").as[Long].head() == 2L)
    spark.sql("DROP TABLE gcat.rtas")
    spark.sql("DROP TABLE gcat.rtas_missing")
  }

  test("an interrupted RTAS publish recovers on the next resolution") {
    root
    Seq(("a", 1L)).toDF("key", "v").createOrReplaceTempView("rec_src")
    def mkTable(dir: String, v: Long): Unit = {
      val t = graft.table.GraftTable.create(spark, dir,
        graft.core.GraftSchema(
          rowKeys = Seq(graft.core.GraftField("key", org.apache.spark.sql.types.StringType)),
          sortKeys = Nil,
          values = Seq(graft.core.GraftField("v", org.apache.spark.sql.types.LongType))))
      t.ingest(Seq(("a", v)).toDF("key", "v"))
    }
    def simulateCrash(name: String, withStaged: Boolean): Unit = {
      mkTable(s"$root/$name", 1L) // the "old" table
      val staged = s"$root/.staging/stage-$name"
      if (withStaged) mkTable(staged, 2L) // the fully-written replacement
      val trash = s"$root/.staging/trash-$name"
      graft.meta.GraftFS.writeBytes(s"$root/.staging/publish-$name.marker",
        s"$staged\n$root/$name\n$trash\n".getBytes("UTF-8"))
      // crash point: old moved aside, staged (maybe) never moved in
      val (fs, p) = graft.meta.GraftFS.resolve(s"$root/$name")
      graft.meta.GraftFS.rename(p, new org.apache.hadoop.fs.Path(trash), fs)
      assert(!Files.exists(java.nio.file.Paths.get(root, name)))
    }
    // staged survived the crash → recovery completes the publish (new data)
    simulateCrash("rec_fwd", withStaged = true)
    assert(spark.sql("SELECT v FROM gcat.rec_fwd").as[Long].collect().toSeq == Seq(2L))
    // staged lost → recovery restores the old directory (old data)
    simulateCrash("rec_back", withStaged = false)
    assert(spark.sql("SELECT v FROM gcat.rec_back").as[Long].collect().toSeq == Seq(1L))
    // markers consumed; a fresh resolution needs no recovery pass
    assert(!stagingLeftovers().exists(_.endsWith(".marker")))
    spark.sql("DROP TABLE gcat.rec_fwd")
    spark.sql("DROP TABLE gcat.rec_back")
  }

  test("DROP/RENAME TABLE consume stale publish markers — no resurrection") {
    // A crash INSIDE the RTAS publish window (after the marker write,
    // before the post-publish marker delete) leaves a marker + trash dir
    // behind while the table exists and works. A later DROP TABLE must
    // kill the marker too, or the next resolution of the dropped name
    // "recovers" the trashed pre-RTAS directory into it.
    root
    def mkAt(dir: String, v: Long): Unit = {
      val t = graft.table.GraftTable.create(spark, dir,
        graft.core.GraftSchema(
          rowKeys = Seq(graft.core.GraftField("key", org.apache.spark.sql.types.StringType)),
          sortKeys = Nil,
          values = Seq(graft.core.GraftField("v", org.apache.spark.sql.types.LongType))))
      t.ingest(Seq(("a", v)).toDF("key", "v"))
    }
    def plantStaleMarker(name: String): Unit = {
      mkAt(s"$root/$name", 2L) // the published (post-RTAS) table
      val trash = s"$root/.staging/trash-$name"
      mkAt(trash, 1L) // the pre-RTAS table, moved aside, never deleted
      graft.meta.GraftFS.writeBytes(s"$root/.staging/publish-$name.marker",
        s"$root/.staging/stage-$name\n$root/$name\n$trash\n".getBytes("UTF-8"))
    }

    plantStaleMarker("mkdrop")
    assert(spark.sql("SELECT v FROM gcat.mkdrop").as[Long].collect().toSeq == Seq(2L),
      "the marker is inert while the table exists")
    spark.sql("DROP TABLE gcat.mkdrop")
    intercept[Exception](spark.sql("SELECT v FROM gcat.mkdrop").collect())
    assert(!Files.exists(java.nio.file.Paths.get(root, "mkdrop")),
      "a dropped table must STAY dropped — no recovery from the stale trash")
    assert(!stagingLeftovers().exists(_.contains("mkdrop")),
      "DROP TABLE must consume the marker and its trash dir")

    // RENAME vacates the old name — a stale marker naming it must not
    // refill it with the pre-RTAS data
    plantStaleMarker("mkren")
    spark.sql("ALTER TABLE gcat.mkren RENAME TO mkren2")
    intercept[Exception](spark.sql("SELECT v FROM gcat.mkren").collect())
    assert(!Files.exists(java.nio.file.Paths.get(root, "mkren")),
      "the vacated name must stay unbound after RENAME")
    assert(!stagingLeftovers().exists(_.contains("mkren")),
      "RENAME must consume markers naming the old path")
    assert(spark.sql("SELECT v FROM gcat.mkren2").as[Long].collect().toSeq == Seq(2L))
    spark.sql("DROP TABLE gcat.mkren2")
  }

  test("RENAME/DROP COLUMN are metadata-only and time-travel-safe") {
    root
    spark.sql(
      """CREATE TABLE gcat.cm (k STRING, a BIGINT, b BIGINT) USING graft
        |TBLPROPERTIES('rowKeys'='k')""".stripMargin)
    spark.sql("INSERT INTO gcat.cm VALUES ('x', 1, 10), ('y', 2, 20)")
    val preRename = graft.meta.JsonStateStore.load(s"$root/cm/meta").currentVersion

    // rename a -> a2: NO data rewrite; old files still serve the column
    spark.sql("ALTER TABLE gcat.cm RENAME COLUMN a TO a2")
    spark.sql("INSERT INTO gcat.cm VALUES ('z', 3, 30)") // new file carries 'a2'
    assert(spark.sql("SELECT k, a2, b FROM gcat.cm ORDER BY k")
      .as[(String, Long, Long)].collect().toSeq ==
      Seq(("x", 1L, 10L), ("y", 2L, 20L), ("z", 3L, 30L)))
    val preDrop = graft.meta.JsonStateStore.load(s"$root/cm/meta").currentVersion

    // drop b: metadata-only; live schema loses it
    spark.sql("ALTER TABLE gcat.cm DROP COLUMN b")
    assert(spark.table("gcat.cm").schema.fieldNames.toSeq == Seq("k", "a2"))
    assert(spark.sql("SELECT * FROM gcat.cm ORDER BY k")
      .as[(String, Long)].collect().toSeq ==
      Seq(("x", 1L), ("y", 2L), ("z", 3L)))

    // time travel reads the HISTORICAL schema: pre-rename sees 'a',
    // pre-drop still sees 'b' with its data
    assert(spark.sql(s"SELECT k, a, b FROM gcat.cm VERSION AS OF $preRename ORDER BY k")
      .as[(String, Long, Long)].collect().toSeq ==
      Seq(("x", 1L, 10L), ("y", 2L, 20L)))
    assert(spark.sql(s"SELECT sum(b) FROM gcat.cm VERSION AS OF $preDrop").as[Long].head() == 60L)

    // stale physical names can never be resurrected: old files still
    // carry 'a' and 'b' bytes that a new column would misread
    intercept[Exception](spark.sql("ALTER TABLE gcat.cm ADD COLUMN a BIGINT"))
    intercept[Exception](spark.sql("ALTER TABLE gcat.cm ADD COLUMN b BIGINT"))
    // keys are immutable
    intercept[Exception](spark.sql("ALTER TABLE gcat.cm RENAME COLUMN k TO kk"))
    intercept[Exception](spark.sql("ALTER TABLE gcat.cm DROP COLUMN k"))

    // compaction rewrites files under the CURRENT names and stays correct
    val t = graft.table.GraftTable.load(spark, s"$root/cm")
    t.compactAll()
    assert(spark.sql("SELECT k, a2 FROM gcat.cm ORDER BY k")
      .as[(String, Long)].collect().toSeq ==
      Seq(("x", 1L), ("y", 2L), ("z", 3L)))
    spark.sql("DROP TABLE gcat.cm")
  }

  test("ALTER TABLE RENAME moves the table with its full history") {
    root
    spark.sql(
      """CREATE TABLE gcat.ren_a (key STRING, v BIGINT) USING graft
        |TBLPROPERTIES('rowKeys'='key')""".stripMargin)
    spark.sql("INSERT INTO gcat.ren_a VALUES ('a', 1)")
    // capture the state version after the first insert (versions are
    // state-store versions, not 0/1/2 statement ordinals)
    val v1 = graft.meta.JsonStateStore.load(s"$root/ren_a/meta").currentVersion
    spark.sql("INSERT INTO gcat.ren_a VALUES ('b', 2)")
    val versions = spark.sql("SELECT count(*) FROM gcat.`ren_a$history`").as[Long].head()
    // the RENAME TO target is resolved inside the same catalog
    spark.sql("ALTER TABLE gcat.ren_a RENAME TO ren_b")
    assert(!Files.exists(java.nio.file.Paths.get(root, "ren_a")))
    assert(spark.sql("SELECT key, v FROM gcat.ren_b ORDER BY key")
      .as[(String, Long)].collect().toSeq == Seq(("a", 1L), ("b", 2L)))
    // history (and so time travel) rides along: paths are table-relative
    assert(spark.sql("SELECT count(*) FROM gcat.`ren_b$history`").as[Long].head()
      == versions)
    assert(spark.sql(s"SELECT count(*) FROM gcat.ren_b VERSION AS OF $v1").as[Long].head() == 1L)
    intercept[Exception](spark.sql("ALTER TABLE gcat.ren_missing RENAME TO x"))
    spark.sql("DROP TABLE gcat.ren_b")
  }
}
