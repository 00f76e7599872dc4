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
