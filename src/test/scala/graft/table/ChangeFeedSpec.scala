package graft.table

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.meta.JsonStateStore

/** Batch CDC (changesBetween / deletedKeysBetween): window walk
  * completeness, compaction-output exclusion, manifest fallback,
  * snapshot semantics at fromVersion=0, and schema evolution across
  * the window.
  */
class ChangeFeedSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("id", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  private def tmp() = Files.createTempDirectory("graft-cdc").toString

  private def version(t: GraftTable): Long =
    t.store.asInstanceOf[JsonStateStore].currentVersion

  test("insert feed reports exactly the window's ingests; compaction outputs excluded") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L))
    table.ingest((0L until 40L).map(i => (i, i)).toDF("id", "v"))
    table.compactAll()
    val v1 = version(table)
    table.ingest((40L until 70L).map(i => (i, i)).toDF("id", "v"))
    val vMid = version(table)
    table.ingest((70L until 100L).map(i => (i, i)).toDF("id", "v"))
    table.compactAll() // inside the window: its output must NOT appear
    val v2 = version(table)

    val feed = table.changesBetween(v1, v2)
    assert(feed.select("id").as[Long].collect().toSet == (40L until 100L).toSet)
    // per-commit versions attached and within the window
    val versions = feed.select("_commit_version").as[Long].collect().toSet
    assert(versions.forall(v => v > v1 && v <= v2) && versions.size == 2)
    // sub-window slices compose
    assert(table.changesBetween(v1, vMid).select("id").as[Long].collect().toSet ==
      (40L until 70L).toSet)
    assert(table.changesBetween(vMid, v2).select("id").as[Long].collect().toSet ==
      (70L until 100L).toSet)
    // empty window
    assert(table.changesBetween(v2, v2).count() == 0)
  }

  test("delete feed reports tombstones even when retired inside the window") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((0L until 50L).map(i => (i, i)).toDF("id", "v"))
    val v1 = version(table)
    table.deleteKeys(Seq(3L, 17L).toDF("id"))
    table.compactAll() // retires the tombstones — they exist in NO endpoint snapshot
    val v2 = version(table)

    assert(table.deletedKeysBetween(v1, v2).select("id").as[Long].collect().toSet ==
      Set(3L, 17L))
    // insert feed over the same window: nothing was ingested
    assert(table.changesBetween(v1, v2).count() == 0)
  }

  test("missing manifests route to the snapshot-diff fallback with identical results") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((0L until 20L).map(i => (i, i)).toDF("id", "v"))
    val v1 = version(table)
    table.ingest((20L until 40L).map(i => (i, i)).toDF("id", "v"))
    table.deleteKeys(Seq(5L).toDF("id"))
    val v2 = version(table)

    val withManifests = table.changesBetween(v1, v2).select("id").as[Long].collect().toSet
    // delete every delta manifest in the window → pure fallback walk
    val meta = new java.io.File(s"$dir/meta")
    meta.listFiles().filter(_.getName.startsWith("delta-v")).foreach(f => assert(f.delete()))
    assert(JsonStateStore.deltaAddedAt(s"$dir/meta", v2).isEmpty)
    assert(table.changesBetween(v1, v2).select("id").as[Long].collect().toSet == withManifests)
    assert(table.deletedKeysBetween(v1, v2).select("id").as[Long].collect().toSet == Set(5L))
  }

  test("fromVersion=0 is snapshot semantics on a compacted table") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((0L until 30L).map(i => (i, i)).toDF("id", "v"))
    table.ingest((30L until 60L).map(i => (i, i)).toDF("id", "v"))
    table.compactAll() // most live files are now dataChange=false
    val v = version(table)
    assert(table.changesBetween(0L, v).select("id").as[Long].collect().toSet ==
      (0L until 60L).toSet)
    assert(table.deletedKeysBetween(0L, v).count() == 0)
  }

  test("a batched version tags each logical commit's rows with its _commit_seq") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    val v0 = version(table)
    // two logical ingest commits folded into ONE log version (the
    // batched committer): the version alone cannot order them — the
    // manifest's per-file seq must ride into the feed
    val r1 = new graft.jobs.Ingest(table)
      .run(Seq((1L, 10L)).toDF("id", "v"), commit = false)
    val r2 = new graft.jobs.Ingest(table)
      .run(Seq((2L, 20L)).toDF("id", "v"), commit = false)
    val out = table.store.asInstanceOf[graft.meta.InMemoryStateStore].commitValidated(Seq(
      graft.meta.StateTransaction.AddFiles(r1.toVector),
      graft.meta.StateTransaction.AddFiles(r2.toVector)))
    assert(out.forall(_ == graft.meta.CommitOutcome.Committed))
    val v1 = version(table)
    assert(v1 == v0 + 1)
    val feed = table.changesBetween(v0, v1)
      .select("id", "_commit_version", "_commit_seq").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(feed.map(_._2).distinct.toSeq == Seq(v1), "one shared log version")
    assert(feed(0)._3 < feed(1)._3, "within-version commit order rides in _commit_seq")
  }

  test("files ingested before an addColumn null-fill the evolved column in the feed") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    val v0 = version(table)
    table.ingest((0L until 10L).map(i => (i, i)).toDF("id", "v"))
    table.addColumn(GraftField("extra", LongType, nullable = true))
    table.ingest((10L until 20L).map(i => (i, i, i * 2)).toDF("id", "v", "extra"))
    val v2 = version(table)
    val feed = table.changesBetween(v0, v2)
    assert(feed.columns.toSeq ==
      Seq("id", "v", "extra", "_commit_version", "_commit_seq"))
    assert(feed.filter($"id" < 10L && $"extra".isNull).count() == 10)
    assert(feed.filter($"id" >= 10L).select("extra").as[Long].collect().toSet ==
      (10L until 20L).map(_ * 2).toSet)
  }
}
