package graft.table

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.meta.JsonStateStore

/** RESTORE to a historical version: one metadata commit, pending-GC
  * resurrection, post-restore writes, generation-correct LWW reads,
  * persistence/replay, and the GC-retention refusal.
  */
class RestoreSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  private def tmp() = Files.createTempDirectory("graft-restore").toString

  private def version(dir: String) = JsonStateStore.load(s"$dir/meta").currentVersion

  test("restore rolls data back in one version; writes continue; replay agrees") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L),
      config = TableConfig(aggregationConfig = "last(v)"))
    table.ingest((1L to 60L).map(i => (i, i)).toDF("k", "v"))
    val v1 = version(dir)
    table.ingest((1L to 30L).map(i => (i, i + 1000L)).toDF("k", "v")) // updates
    table.deleteKeys(Seq(40L).toDF("k"))
    assert(table.toDF.count() == 59)

    table.restoreTo(v1)
    assert(version(dir) == v1 + 3, "restore is one metadata version")
    val got = table.toDF.select("k", "v").as[(Long, Long)].collect().toMap
    assert(got == (1L to 60L).map(i => i -> i).toMap, "pre-update contents restored")
    // dropped files queued for GC; a fresh load replays identically
    assert(JsonStateStore.load(s"$dir/meta").unreferencedFiles.nonEmpty)
    assert(GraftTable.load(spark, dir).toDF.count() == 60)

    // the table keeps working: a NEW generation lands above the restored
    table.ingest(Seq((1L, 7777L)).toDF("k", "v"))
    assert(GraftTable.load(spark, dir).lookup(1L)
      .select("v").as[Long](org.apache.spark.sql.Encoders.scalaLong).head() == 7777L)
  }

  test("restore resurrects files pending GC; refuses once GC collected them") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(gcDelayMinutes = 0))
    table.ingest((1L to 10L).map(i => (i, i)).toDF("k", "v"))
    val v1 = version(dir)
    table.overwrite((100L to 105L).map(i => (i, i)).toDF("k", "v"))
    // v1's file is in the GC queue but not yet deleted: restore resurrects it
    table.restoreTo(v1)
    assert(table.toDF.count() == 10)
    val st = JsonStateStore.load(s"$dir/meta")
    assert(!st.unreferencedFiles.exists(e =>
      st.fileReferences.exists(_.filename == e.filename)),
      "restored files left the GC queue")

    // drop again and GC for real: the target becomes unrestorable
    table.overwrite((200L to 205L).map(i => (i, i)).toDF("k", "v"))
    new graft.jobs.GarbageCollector(table).run()
    val e = intercept[IllegalArgumentException] { table.restoreTo(v1) }
    assert(e.getMessage.contains("garbage-collected"))
  }
}
