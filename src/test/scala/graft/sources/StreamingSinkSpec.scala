package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** Native streaming sink (`df.writeStream.format("graft")`): each epoch
  * lands as one atomic generation under the (sink:queryId, epochId)
  * watermark — exactly-once, shared root-homed files, LWW resolution
  * across epochs, and sketch sidecars present.
  */
class StreamingSinkSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  test("memory stream sinks exactly-once; LWW resolves epochs in order") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val cp = Files.createTempDirectory("graft-sink-cp").toString
    GraftTable.create(spark, dir, schema, splitPoints = Seq(50L),
      config = TableConfig(aggregationConfig = "last(v)"))

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("k", "v")
      .writeStream.format("graft")
      .option("path", dir)
      .option("checkpointLocation", cp)
      .outputMode("append")
      .start()
    try {
      mem.addData((1L to 60L).map(i => (i, i)): _*)
      q.processAllAvailable()
      val t1 = GraftTable.load(spark, dir)
      assert(t1.toDF.count() == 60)
      // epoch 1 wrote shared root-homed files (not one per leaf)
      val refs1 = t1.store.fileReferences
      assert(refs1.map(_.filename).distinct.size < refs1.size || refs1.size <= 2,
        "per-task shared files, not per-leaf")
      assert(refs1.map(_.rowCount).sum == 60L)

      // epoch 2: updates resolve ABOVE epoch 1 on the LWW table
      mem.addData((1L to 30L).map(i => (i, i + 1000L)): _*)
      q.processAllAvailable()
      val got = GraftTable.load(spark, dir).toDF
        .select("k", "v").as[(Long, Long)].collect().toMap
      assert(got.size == 60 && got(1L) == 1001L && got(31L) == 31L)

      // exactly-once watermark recorded per epoch
      val st = graft.meta.JsonStateStore.load(s"$dir/meta")
      val wm = st.txnWatermarks.collect { case (k, v) if k.startsWith("sink:") => v }
      assert(wm.nonEmpty && wm.max >= 1L)

      // sketch sidecars landed with the files
      st.fileReferences.map(f => s"$dir/data/${f.physicalPartitionId}/${f.filename}")
        .distinct.foreach { p =>
          assert(graft.meta.GraftFS.exists(p + ".sketches"), s"missing sidecar for $p")
        }
    } finally q.stop()

    // the sunk table compacts and reads like any other
    val table = GraftTable.load(spark, dir)
    table.compactAll()
    assert(table.toDF.count() == 60)
    assert(spark.read.format("graft").load(dir)
      .filter($"k" === 1L).select("v").as[Long].head() == 1001L)
  }

  test("an epoch past the writer heap budget spills sorted runs and stays correct") {
    val dir = Files.createTempDirectory("graft-sink-spill").toString
    val cp = Files.createTempDirectory("graft-sink-spill-cp").toString
    GraftTable.create(spark, dir, schema, splitPoints = Seq(5000L),
      config = TableConfig(aggregationConfig = "last(v)"))
    // a few KB of heap per writer: one 10k-row epoch forces MANY spills
    System.setProperty("graft.sink.spillBytes", "4096")
    try {
      implicit val sq = spark.sqlContext
      val mem = MemoryStream[(Long, Long)]
      val q = mem.toDF().toDF("k", "v")
        .writeStream.format("graft")
        .option("path", dir)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .start()
      try {
        // descending input: the merged output must still be key-sorted
        mem.addData((10000L to 1L by -1L).map(i => (i, i * 2)): _*)
        q.processAllAvailable()
      } finally q.stop()
    } finally System.clearProperty("graft.sink.spillBytes")

    val table = GraftTable.load(spark, dir)
    assert(table.toDF.count() == 10000)
    val refs = table.store.fileReferences
    assert(refs.map(_.rowCount).sum == 10000L, "exact per-leaf counts across spills")
    // the written shared files are genuinely key-sorted: a merge-path
    // compaction (which asserts sorted input) succeeds and values survive
    table.compactAll()
    val got = table.toDF.select("k", "v").as[(Long, Long)].collect().toMap
    assert(got.size == 10000 && got(1L) == 2L && got(9999L) == 19998L)
    // no spill files left behind
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    assert(!tmp.listFiles().exists(f =>
      f.getName.startsWith("graft-sink-spill-") && f.getName.endsWith(".run")),
      "spill runs must be deleted after commit")
  }

  test("autoCompactEvery keeps a long-running stream's file count bounded") {
    val dir = Files.createTempDirectory("graft-sink-ac").toString
    val cp = Files.createTempDirectory("graft-sink-ac-cp").toString
    GraftTable.create(spark, dir, schema, splitPoints = Seq(50L),
      config = TableConfig(aggregationConfig = "sum(v)"))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("k", "v")
      .writeStream.format("graft")
      .option("path", dir)
      .option("checkpointLocation", cp)
      .option("autoCompactEvery", "5")
      .outputMode("append")
      .start()
    try {
      // 20 micro-batches; every key lands once per batch
      (1 to 20).foreach { b =>
        mem.addData((1L to 100L).map(i => (i, b.toLong)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val table = GraftTable.load(spark, dir)
    // maintenance ran: uncompacted runs per leaf stay within one
    // auto-compact window (N epochs) + the strategy batch size slack,
    // nowhere near the 20 files/leaf an unmaintained stream accumulates
    val perLeaf = table.store.fileReferences.groupBy(_.partitionId)
      .values.map(_.size)
    assert(perLeaf.max <= 6,
      s"auto-compaction must bound files per leaf, got ${perLeaf.toSeq.sorted.reverse}")
    // GC is the operator's explicit step; data correctness is untouched
    val got = table.toDF.select("k", "v").as[(Long, Long)].collect().toMap
    assert(got.size == 100 && got(1L) == (1 to 20).sum.toLong)
  }

  test("auto-compaction counts LANDED epochs, not raw epoch numbers") {
    // With empty micro-batches interleaved so that every epoch carrying
    // data has an EVEN epochId, an (epochId+1)%2 trigger would never
    // fire — landed-epoch counting compacts after every 2 data batches
    // regardless of how the epoch numbers fall.
    val dir = Files.createTempDirectory("graft-sink-ac2").toString
    val cp = Files.createTempDirectory("graft-sink-ac2-cp").toString
    GraftTable.create(spark, dir, schema, splitPoints = Seq(50L),
      config = TableConfig(aggregationConfig = "sum(v)"))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("k", "v")
      .writeStream.format("graft")
      .option("path", dir)
      .option("checkpointLocation", cp)
      .option("autoCompactEvery", "2")
      .outputMode("append")
      .start()
    try {
      (1 to 8).foreach { b =>
        // data batch (even epochId: 0, 2, 4, ...)
        mem.addData((1L to 100L).map(i => (i, b.toLong)): _*)
        q.processAllAvailable()
        // empty batch (odd epochId) — advances the offset, lands nothing
        mem.addData(Seq.empty[(Long, Long)]: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val table = GraftTable.load(spark, dir)
    val perLeaf = table.store.fileReferences.groupBy(_.partitionId).values.map(_.size)
    assert(perLeaf.max <= 3,
      s"compaction must trigger on landed epochs despite empty batches, " +
        s"got ${perLeaf.toSeq.sorted.reverse} files per leaf")
    val got = table.toDF.select("k", "v").as[(Long, Long)].collect().toMap
    assert(got.size == 100 && got(1L) == (1 to 8).sum.toLong)
  }

  test("schema mismatch is refused at stream start") {
    val dir = Files.createTempDirectory("graft-sink2").toString
    val cp = Files.createTempDirectory("graft-sink2-cp").toString
    GraftTable.create(spark, dir, schema)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Long]
    intercept[Exception] {
      val q = mem.toDF().toDF("wrong")
        .writeStream.format("graft").option("path", dir)
        .option("checkpointLocation", cp).start()
      try { mem.addData(1L); q.processAllAvailable() } finally q.stop()
    }
  }
}
