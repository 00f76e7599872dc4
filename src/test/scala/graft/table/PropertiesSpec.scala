package graft.table

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.meta.{JsonStateStore, StateTransaction}

/** Versioned table-property edits (the reference's admin property
  * editor as ONE metadata transaction): forward-applying filter/index
  * changes, the empty-table-only aggregation rule, durability + replay,
  * time travel to the OLD config, and the SQL ALTER TABLE surface.
  */
class PropertiesSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("id", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("ts", LongType), GraftField("v", LongType)))

  private def tmp() = Files.createTempDirectory("graft-props").toString

  test("filter change applies forward: reads + compaction drop aged rows") {
    val dir = tmp()
    var table = GraftTable.create(spark, dir, schema)
    val farFuture = System.currentTimeMillis() + 1000L * 86400 * 365
    table.ingest(Seq((1L, 0L, 10L), (2L, farFuture, 20L)).toDF("id", "ts", "v"))
    assert(table.toDF.count() == 2)

    table = table.setProperties(Map("filter" -> "ageOff(ts,1000000)"))
    assert(table.config.filterConfig == "ageOff(ts,1000000)")
    assert(table.toDF.select("id").as[Long].collect().toSeq == Seq(2L),
      "ts=0 row aged off by the NEW filter")
    // a fresh load sees the persisted change; compaction applies it
    val re = GraftTable.load(spark, dir)
    assert(re.config.filterConfig == "ageOff(ts,1000000)")
    re.compactAll()
    assert(re.store.fileReferences.map(_.rowCount).sum == 1L, "aged row purged")
  }

  test("aggregation change: refused on non-empty, allowed while empty, validated") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    // bad key refused by validation even while empty
    intercept[Exception] { table.setProperties(Map("aggregation" -> "sum(nope)")) }
    intercept[IllegalArgumentException] { table.setProperties(Map("bogus" -> "x")) }
    val t2 = table.setProperties(Map("aggregation" -> "sum(v),min(ts)"))
    assert(t2.config.aggregationConfig == "sum(v),min(ts)")
    t2.ingest(Seq((1L, 5L, 10L), (1L, 6L, 20L)).toDF("id", "ts", "v"))
    assert(t2.toDF.select("v").as[Long].head() == 30L, "new agg config aggregates")
    // now non-empty: changing aggregation is refused
    intercept[Exception] { t2.setProperties(Map("aggregation" -> "")) }
  }

  test("property edits version through the log: replay + time travel") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    table.ingest(Seq((1L, 0L, 10L)).toDF("id", "ts", "v"))
    val vBefore = JsonStateStore.load(s"$dir/meta").currentVersion
    table.setProperties(Map("filter" -> "ageOff(ts,1000000)", "index" -> "bloom(v)"))

    // a cold load replays the SetProperties transaction
    val st = JsonStateStore.load(s"$dir/meta")
    assert(st.filterConfig == "ageOff(ts,1000000)" && st.indexConfig == "bloom(v)")
    assert(st.currentVersion == vBefore + 1, "one transaction for both keys")
    // time travel to BEFORE the edit shows the old (empty) config
    val old = GraftTable.loadAsOf(spark, dir, vBefore)
    assert(old.config.filterConfig.isEmpty && old.config.indexConfig.isEmpty)
    assert(old.toDF.count() == 1, "old version reads WITHOUT the filter")
    // a rival handle loaded before a later edit catches up on reload
    val rival = JsonStateStore.load(s"$dir/meta")
    assert(rival.indexConfig == "bloom(v)")
    table.setProperties(Map("index" -> ""))
    rival.reloadLatest()
    assert(rival.indexConfig.isEmpty, "reload replays the property edit")
  }

  test("SetProperties survives a snapshot interval and batches with other txns") {
    val dir = tmp()
    val st = JsonStateStore.create(dir, schema,
      PartitionTree.fromSplitPoints(schema, Nil))
    val leaf = st.partitionTree.leaves.head.id
    val out = st.commitValidated(Seq(
      StateTransaction.AddFiles(Vector(graft.meta.FileReference("f1", leaf, 1))),
      StateTransaction.SetProperties(Map("filter" -> "ageOff(ts,5)")),
      // invalid sibling: unknown column — fails alone, batch survives
      StateTransaction.SetProperties(Map("filter" -> "ageOff(zzz,5)"))))
    assert(out(0) == graft.meta.CommitOutcome.Committed)
    assert(out(1) == graft.meta.CommitOutcome.Committed)
    assert(out(2).isInstanceOf[graft.meta.CommitOutcome.Failed])
    val re = JsonStateStore.load(dir)
    assert(re.filterConfig == "ageOff(ts,5)")
    assert(re.fileReferences.size == 1)
  }

  test("SQL: ALTER TABLE SET/UNSET TBLPROPERTIES through the catalog") {
    val root = Files.createTempDirectory("graft-props-sql").toString
    spark.conf.set("spark.sql.catalog.gp", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gp.root", root)
    spark.sql(
      """CREATE TABLE gp.t (id BIGINT, ts BIGINT, v BIGINT) USING graft
        |TBLPROPERTIES('rowKeys'='id')""".stripMargin)
    val farFuture = System.currentTimeMillis() + 1000L * 86400 * 365
    spark.sql(s"INSERT INTO gp.t VALUES (1, 0, 10), (2, $farFuture, 20)")
    spark.sql("ALTER TABLE gp.t SET TBLPROPERTIES('filter'='ageOff(ts,1000000)')")
    assert(spark.sql("SELECT id FROM gp.t").as[Long].collect().toSeq == Seq(2L))
    spark.sql("ALTER TABLE gp.t UNSET TBLPROPERTIES('filter')")
    assert(spark.sql("SELECT count(*) FROM gp.t").as[Long].head() == 2L)
    // invalid property value surfaces the validation error
    intercept[Exception] {
      spark.sql("ALTER TABLE gp.t SET TBLPROPERTIES('filter'='ageOff(zzz,1)')")
    }
  }
}
