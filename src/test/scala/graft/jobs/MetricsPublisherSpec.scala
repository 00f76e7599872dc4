package graft.jobs

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.GraftTable

/** Metrics export seam: A6 snapshots land in a normal graft table keyed
  * by (table_name, ts) and read back as engine queries; the embedded
  * timer keeps publishing until closed.
  */
class MetricsPublisherSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  test("publish records state-store counters; snapshots read back in time order") {
    val base = Files.createTempDirectory("graft-metricspub").toString
    val src = GraftTable.create(spark, s"$base/src", schema, splitPoints = Seq(50L))
    val sink = MetricsPublisher.createTable(spark, s"$base/m")

    src.ingest((0L until 100L).map(i => (i, i)).toDF("k", "v"))
    MetricsPublisher.publish(src, sink, "src", nowMs = 1000L)
    src.ingest((0L until 50L).map(i => (i, i)).toDF("k", "v"))
    MetricsPublisher.publish(src, sink, "src", nowMs = 2000L)

    val got = sink.toDF.orderBy("ts")
      .select("table_name", "ts", "row_count", "leaf_partition_count")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(1000L, 2000L))
    assert(got.map(_._3) == Seq(100L, 150L))
    assert(got.forall(_._4 == 2L))
    // raw numerator/denominator reproduce the A6 average exactly
    val (refs, parts) = sink.toDF.filter($"ts" === 2000L)
      .select("file_references", "partitions_with_files")
      .as[(Long, Long)].head()
    assert(refs.toDouble / parts == src.metrics.averageFileReferencesPerPartition)
  }

  test("the embedded timer publishes until closed") {
    val base = Files.createTempDirectory("graft-metricspub2").toString
    val src = GraftTable.create(spark, s"$base/src", schema)
    src.ingest(Seq((1L, 1L)).toDF("k", "v"))
    MetricsPublisher.createTable(spark, s"$base/m")
    val loop = MetricsPublisher.start(spark,
      Seq("src" -> s"$base/src"), s"$base/m", intervalMs = 150L)
    try {
      val deadline = System.currentTimeMillis() + 30000
      def count(): Long = GraftTable.load(spark, s"$base/m").toDF.count()
      while (count() < 2 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(count() >= 2, "timer must record repeated snapshots")
    } finally loop.close()
    val after = GraftTable.load(spark, s"$base/m").toDF.count()
    Thread.sleep(400)
    assert(GraftTable.load(spark, s"$base/m").toDF.count() == after,
      "closed loop must stop publishing")
  }
}
