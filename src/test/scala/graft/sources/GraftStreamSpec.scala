package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** The table-changes stream: state-store versions as offsets, ingested
  * files exactly once across restarts, compaction outputs never.
  */
class GraftStreamSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  /** Drain all available table changes into a parquet file sink (the
    * durable sink that supports checkpoint RESUME — the memory sink
    * refuses recovery, and resume is exactly what the restart test
    * needs).
    */
  private def drainTo(dir: String, cp: String, out: String): Unit = {
    val q = spark.readStream.format("graft").load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", cp)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("readStream delivers each ingested row exactly once across restarts, skipping compactions") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val cp = Files.createTempDirectory("graft-stream-cp").toString
    val out = Files.createTempDirectory("graft-stream-out").toString
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L))
    table.ingest((1L to 40L).map(i => (i, i)).toDF("k", "v"))

    drainTo(dir, cp, out)
    assert(spark.read.parquet(out).select("k").as[Long].collect().toSet == (1L to 40L).toSet)

    // appends + a compaction between restarts: the second drain must see
    // ONLY the new appends — the compacted rewrite of 1..80 repeats rows
    // the stream already delivered and must not re-emit
    table.ingest((41L to 80L).map(i => (i, i)).toDF("k", "v"))
    table.compactAll()
    table.ingest((81L to 100L).map(i => (i, i)).toDF("k", "v"))

    drainTo(dir, cp, out)
    val all = spark.read.parquet(out).select("k").as[Long].collect()
    assert(all.length == 100) // 180 would mean the compaction output was re-emitted
    assert(all.toSet == (1L to 100L).toSet)
  }

  test("initial load of a pre-compacted table is snapshot-complete") {
    // all live files are compaction outputs (dataChange=false) here — a
    // diff-style initial batch would deliver NOTHING
    val dir = Files.createTempDirectory("graft-stream3").toString
    val cp = Files.createTempDirectory("graft-stream3-cp").toString
    val out = Files.createTempDirectory("graft-stream3-out").toString
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((1L to 25L).map(i => (i, i)).toDF("k", "v"))
    table.ingest((26L to 50L).map(i => (i, i)).toDF("k", "v"))
    table.compactAll()
    drainTo(dir, cp, out)
    assert(spark.read.parquet(out).select("k").as[Long].collect().toSet == (1L to 50L).toSet)
  }

  test("streaming count(*) survives the empty projection (row path, not the vectorized bridge)") {
    val dir = Files.createTempDirectory("graft-stream4").toString
    val cp = Files.createTempDirectory("graft-stream4-cp").toString
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((1L to 20L).map(i => (i, i)).toDF("k", "v"))
    val mem = s"gs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("graft").load(dir)
      .groupBy().count()
      .writeStream.format("memory").queryName(mem)
      .option("checkpointLocation", cp)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(mem).as[Long].head() == 20L)
  }

  test("a table with a persistent filter refuses the changes stream (no row leak)") {
    val dir = Files.createTempDirectory("graft-stream5").toString
    val cp = Files.createTempDirectory("graft-stream5-cp").toString
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(filterConfig = "ageOff(v,1000)"))
    table.ingest((1L to 5L).map(i => (i, System.currentTimeMillis())).toDF("k", "v"))
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").load(dir)
        .writeStream.format("memory")
        .queryName(s"gs_${java.util.UUID.randomUUID().toString.replace("-", "")}")
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("persistent filter")))
  }

  test("catch-up windows plan from delta manifests; snapshot walk only as fallback") {
    val dir = Files.createTempDirectory("graft-stream6").toString
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(500L))
    (1 to 12).foreach { i =>
      table.ingest(Seq((i.toLong, i.toLong), (i + 500L, i.toLong)).toDF("k", "v"))
    }
    table.compactAll() // adds dataChange=false outputs the stream must skip
    (13 to 15).foreach { i =>
      table.ingest(Seq((i.toLong, i.toLong)).toDF("k", "v"))
    }
    val latest = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    val stream = new GraftMicroBatchStream(dir,
      Seq(GraftField("k", LongType), GraftField("v", LongType)), GraftField("k", LongType))
    def plan(sv: Long, ev: Long): Seq[String] =
      stream.planInputPartitions(GraftStreamOffset(sv), GraftStreamOffset(ev))
        .map(_.asInstanceOf[GraftStreamFilePartition].path).sorted.toSeq

    // baseline: full artifacts present — a many-version catch-up window
    val expected = plan(1, latest)
    assert(expected.nonEmpty)

    val meta = new java.io.File(s"$dir/meta")
    def deltas = meta.listFiles().filter(_.getName.startsWith("delta-v"))
    assert(deltas.length >= latest.toInt - 1,
      "every commit after the first must have written a delta manifest")

    // delete EVERY snapshot inside the window: with deltas present the
    // planner must not touch them (the old implementation parsed one per
    // version and would throw here)
    (1L until latest).foreach { v =>
      val f = new java.io.File(meta, s"state-v$v.json")
      if (f.exists()) assert(f.delete())
    }
    assert(plan(1, latest) == expected, "delta-only catch-up must equal baseline")

    // restore-by-fallback: drop all deltas on a SECOND identical table
    // and plan from snapshots alone
    val dir2 = Files.createTempDirectory("graft-stream6b").toString
    val table2 = GraftTable.create(spark, dir2, schema, splitPoints = Seq(500L))
    (1 to 12).foreach { i =>
      table2.ingest(Seq((i.toLong, i.toLong), (i + 500L, i.toLong)).toDF("k", "v"))
    }
    table2.compactAll()
    (13 to 15).foreach { i =>
      table2.ingest(Seq((i.toLong, i.toLong)).toDF("k", "v"))
    }
    val latest2 = table2.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    val stream2 = new GraftMicroBatchStream(dir2,
      Seq(GraftField("k", LongType), GraftField("v", LongType)), GraftField("k", LongType))
    def plan2(sv: Long, ev: Long): Seq[Long] =
      stream2.planInputPartitions(GraftStreamOffset(sv), GraftStreamOffset(ev))
        .map(_.asInstanceOf[GraftStreamFilePartition].path).sorted
        .map(p => spark.read.parquet(p).count())
    val before = plan2(1, latest2)
    // mixed mode first: every second delta gone, those versions diff
    // consecutive snapshots while the rest still plan from manifests
    val meta2 = new java.io.File(s"$dir2/meta")
    meta2.listFiles().filter(_.getName.startsWith("delta-v"))
      .sortBy(_.getName).zipWithIndex
      .foreach { case (f, i) => if (i % 2 == 0) assert(f.delete()) }
    assert(plan2(1, latest2) == before, "mixed delta/snapshot planning must equal baseline")
    // then pure snapshot-walk fallback
    meta2.listFiles().filter(_.getName.startsWith("delta-v")).foreach(f => assert(f.delete()))
    assert(plan2(1, latest2) == before, "snapshot-walk fallback must equal delta planning")

    // sub-window on the delta-only table: still snapshot-free
    assert(plan(3, latest).toSet.subsetOf(expected.toSet))
  }

  test("stream prunes columns and applies residual filters") {
    val dir = Files.createTempDirectory("graft-stream2").toString
    val cp = Files.createTempDirectory("graft-stream2-cp").toString
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((1L to 30L).map(i => (i, i * 10)).toDF("k", "v"))

    val mem = s"gs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("graft").load(dir)
      .filter($"k" > 25L).select("v")
      .writeStream.format("memory").queryName(mem)
      .option("checkpointLocation", cp)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(mem).as[Long].collect().toSet == (26L to 30L).map(_ * 10).toSet)
  }

  test("maxVersionsPerTrigger bounds catch-up batches, exactly once") {
    val dir = Files.createTempDirectory("graft-stream-vpt").toString
    val cp = Files.createTempDirectory("graft-stream-vpt-cp").toString
    val out = Files.createTempDirectory("graft-stream-vpt-out").toString
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((1L to 10L).map(i => (i, i)).toDF("k", "v"))

    def drainCapped(): Long = {
      val q = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.lastProgress.batchId
    }
    drainCapped()
    assert(spark.read.parquet(out).select("k").as[Long].collect().toSet == (1L to 10L).toSet)

    // fall 5 ingest versions behind, then resume: the cap must split the
    // catch-up into one-version batches (>= 5 batch ids consumed) while
    // still delivering every row exactly once
    (1 to 5).foreach(g => table.ingest(
      (1L to 10L).map(i => (g * 10L + i, i)).toDF("k", "v")))
    val lastBatch = drainCapped()
    val all = spark.read.parquet(out).select("k").as[Long].collect()
    assert(all.length == 60, s"exactly once: got ${all.length}")
    assert(all.toSet == (1L to 10L).toSet ++
      (1 to 5).flatMap(g => (1L to 10L).map(i => g * 10L + i)))
    assert(lastBatch >= 5, s"expected >=5 capped catch-up batches, last id $lastBatch")
  }
}
