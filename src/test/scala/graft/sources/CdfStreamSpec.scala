package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** Streaming change-data-feed (`readChangeFeed`): puts AND deletes as a
  * stream with (_op, _commit_version, _commit_seq); resolving the feed
  * per key by (version, seq) reconstructs the table's own reads,
  * including delete-then-reingest and pending markers at initial load.
  */
class CdfStreamSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  private def drainCdf(dir: String, cp: String, out: String): Unit = {
    val q = spark.readStream.format("graft").option("readChangeFeed", "true")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", cp)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Resolve a drained feed to final table state: newest (version, seq)
    * wins per key (put ties over delete cannot happen: a MERGE stamps
    * markers one generation below its puts).
    */
  private def resolve(feed: DataFrame): Map[Long, Long] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k")
      .orderBy(col("_commit_version").desc, col("_commit_seq").desc,
        col("_op").asc) // 'delete' < 'put': puts win exact ties defensively
    feed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("_op") === "put")
      .select("k", "v").as[(Long, Long)].collect().toMap
  }

  test("feed delivers puts and deletes; resolution matches the table read") {
    val dir = Files.createTempDirectory("graft-cdf").toString
    val cp = Files.createTempDirectory("graft-cdf-cp").toString
    val out = Files.createTempDirectory("graft-cdf-out").toString
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L),
      config = TableConfig(aggregationConfig = "last(v)"))
    table.ingest((1L to 60L).map(i => (i, i)).toDF("k", "v"))

    drainCdf(dir, cp, out)
    val first = spark.read.parquet(out)
    assert(first.filter(col("_op") === "delete").count() == 0)
    assert(first.count() == 60)

    // window 2: update, delete, delete-then-reingest, and a compaction
    table.ingest(Seq((1L, 111L)).toDF("k", "v"))
    table.deleteKeys(Seq(2L).toDF("k"))
    table.deleteKeys(Seq(3L).toDF("k"))
    table.ingest(Seq((3L, 333L)).toDF("k", "v"))
    table.compactAll() // rewrites must NOT re-feed

    drainCdf(dir, cp, out)
    val feed = spark.read.parquet(out)
    assert(feed.filter(col("_op") === "delete").count() == 2)
    assert(feed.filter(col("_op") === "delete").select("v").collect().forall(_.isNullAt(0)),
      "delete rows carry NULL values")
    assert(feed.count() == 60 + 2 + 2, "compaction outputs never re-feed")
    val resolved = resolve(feed)
    val direct = table.toDF.select("k", "v").as[(Long, Long)].collect().toMap
    assert(resolved == direct, "feed resolution == table read")
    assert(resolved(1L) == 111L && !resolved.contains(2L) && resolved(3L) == 333L)
  }

  test("initial load carries PENDING delete markers (the insert feed's refused case)") {
    val dir = Files.createTempDirectory("graft-cdf2").toString
    val cp = Files.createTempDirectory("graft-cdf2-cp").toString
    val out = Files.createTempDirectory("graft-cdf2-out").toString
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(aggregationConfig = "last(v)"))
    table.ingest((1L to 10L).map(i => (i, i)).toDF("k", "v"))
    table.deleteKeys(Seq(4L).toDF("k"))          // pending marker
    table.ingest(Seq((5L, 55L)).toDF("k", "v"))  // newer generation
    table.deleteKeys(Seq(6L).toDF("k"))
    table.ingest(Seq((6L, 66L)).toDF("k", "v"))  // re-ingest above its marker

    // the INSERT-only stream refuses this table state…
    intercept[Exception] {
      spark.readStream.format("graft").load(dir)
        .writeStream.format("parquet")
        .option("path", Files.createTempDirectory("x").toString)
        .option("checkpointLocation", Files.createTempDirectory("y").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    // …the CDF stream delivers it: markers ride at their true generation
    drainCdf(dir, cp, out)
    val feed = spark.read.parquet(out)
    assert(feed.filter(col("_op") === "delete").count() == 2)
    val resolved = resolve(feed)
    val direct = table.toDF.select("k", "v").as[(Long, Long)].collect().toMap
    assert(resolved == direct)
    assert(!resolved.contains(4L) && resolved(5L) == 55L && resolved(6L) == 66L,
      "delete-then-reingest resolves by generation, not arrival order")
  }

  test("a window containing RESTORE resolves to the restored table (reset diff)") {
    val dir = Files.createTempDirectory("graft-cdf-restore").toString
    val cp = Files.createTempDirectory("graft-cdf-restore-cp").toString
    val out = Files.createTempDirectory("graft-cdf-restore-out").toString
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L),
      config = TableConfig(aggregationConfig = "last(v)"))
    // target state: 1..10, with a delete-then-reingest INSIDE it (6)
    table.ingest((1L to 10L).map(i => (i, i)).toDF("k", "v"))
    table.deleteKeys(Seq(6L).toDF("k"))
    table.ingest(Seq((6L, 66L)).toDF("k", "v"))
    val target = graft.meta.JsonStateStore.load(s"$dir/meta").currentVersion

    drainCdf(dir, cp, out) // subscriber caught up BEFORE the rolled-back work

    // rolled-back work: an update, a fresh insert, and a delete
    table.ingest(Seq((1L, 111L)).toDF("k", "v"))   // update k=1
    table.ingest(Seq((99L, 999L)).toDF("k", "v"))  // insert k=99
    table.deleteKeys(Seq(2L).toDF("k"))            // delete k=2
    table.restoreTo(target)
    // post-restore work lands as a new generation above the restored state
    table.ingest(Seq((3L, 333L)).toDF("k", "v"))

    drainCdf(dir, cp, out) // drains the window CONTAINING the restore
    val feed = spark.read.parquet(out)
    val resolved = resolve(feed)
    val direct = table.toDF.select("k", "v").as[(Long, Long)].collect().toMap
    assert(resolved == direct,
      s"subscriber must converge to the restored table: $resolved vs $direct")
    assert(resolved(1L) == 1L, "rolled-back update retracted to the restored value")
    assert(!resolved.contains(99L), "rolled-back insert ends absent")
    assert(resolved(2L) == 2L, "rolled-back delete: the key is visible again")
    assert(resolved(6L) == 66L,
      "delete-then-reingest INSIDE the restored state keeps its generation order")
    assert(resolved(3L) == 333L, "post-restore writes land above the reset")

    // RESTORE refuses to ride a composite commit (the manifest marker
    // cannot represent it)
    intercept[IllegalArgumentException] {
      graft.meta.StateTransaction.Batch(Vector(
        graft.meta.StateTransaction.Restore(Vector.empty, Vector.empty, 0L)))
    }
  }

  test("CDF is read-only and refuses filtered/transformed tables") {
    val dir = Files.createTempDirectory("graft-cdf3").toString
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(filterConfig = "ageOff(v,1000)"))
    table.ingest(Seq((1L, System.currentTimeMillis())).toDF("k", "v"))
    val e = intercept[Exception] {
      spark.readStream.format("graft").option("readChangeFeed", "true").load(dir)
        .writeStream.format("parquet")
        .option("path", Files.createTempDirectory("o").toString)
        .option("checkpointLocation", Files.createTempDirectory("c").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(e.getMessage != null)
  }

  test("maxVersionsPerTrigger caps CDF catch-up; resolution unchanged") {
    val dir = Files.createTempDirectory("graft-cdf-vpt").toString
    val cp = Files.createTempDirectory("graft-cdf-vpt-cp").toString
    val out = Files.createTempDirectory("graft-cdf-vpt-out").toString
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(aggregationConfig = "last(v)"))
    table.ingest((1L to 10L).map(i => (i, i)).toDF("k", "v"))

    def drainCapped(): Long = {
      val q = spark.readStream.format("graft").option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "1").load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.lastProgress.batchId
    }
    drainCapped()
    // fall behind by 3 versions (upsert, delete, upsert) then catch up
    // one version per batch — the resolved feed must equal the table
    table.ingest(Seq((2L, 222L)).toDF("k", "v"))
    table.deleteKeys(Seq(5L).toDF("k"))
    table.ingest(Seq((5L, 555L)).toDF("k", "v"))
    val lastBatch = drainCapped()
    assert(lastBatch >= 3, s"expected >=3 capped batches, last id $lastBatch")
    val expect = table.toDF.select("k", "v").as[(Long, Long)].collect().toMap
    assert(resolve(spark.read.parquet(out)) == expect)
  }
}
