package graft.query

import java.nio.channels.Channels

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The Arrow sink must round-trip rows bit-for-bit through the Arrow
  * IPC format: export partitions, read every file back with the Arrow
  * Java reader, compare the multiset of rows (nulls included).
  */
class ArrowExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def readBack(path: String): Seq[(Option[Long], Option[String], Option[Double])] = {
    val (fs, p) = graft.meta.GraftFS.resolve(path)
    val alloc = new RootAllocator(Long.MaxValue)
    val in = fs.open(p)
    val reader = new ArrowStreamReader(Channels.newChannel(in), alloc)
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Option[Long], Option[String], Option[Double])]
    try {
      val root = reader.getVectorSchemaRoot
      while (reader.loadNextBatch()) {
        val ids = root.getVector(0).asInstanceOf[BigIntVector]
        val txts = root.getVector(1).asInstanceOf[VarCharVector]
        val vals = root.getVector(2).asInstanceOf[Float8Vector]
        (0 until root.getRowCount).foreach { i =>
          rows += ((
            if (ids.isNull(i)) None else Some(ids.get(i)),
            if (txts.isNull(i)) None
            else Some(new String(txts.get(i), java.nio.charset.StandardCharsets.UTF_8)),
            if (vals.isNull(i)) None else Some(vals.get(i))))
        }
      }
    } finally {
      reader.close()
      in.close()
      alloc.close()
    }
    rows.toSeq
  }

  test("export round-trips rows (and nulls) through Arrow IPC files") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "alpha", 1.5), (2L, null, 2.5), (3L, "gamma", null),
      (null.asInstanceOf[java.lang.Long], "delta", 4.5)
    ).toDF("id", "txt", "v").repartition(3)
    val out = "/tmp/arrow-export-" + java.util.UUID.randomUUID().toString.take(8)
    try {
      val manifest = ArrowExport.exportArrow(df, out)
      assert(manifest.map(_._2).sum == 4L, s"manifest rows: $manifest")
      val got = manifest.flatMap { case (path, _) => readBack(path) }.toSet
      val expect = df.collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getLong(0)),
        Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(got == expect)
    } finally graft.meta.GraftFS.deleteRecursive(out)
  }

  test("a big multi-batch partition round-trips with exact counts") {
    val df = spark.range(0, 20000).select(col("id"),
      concat(lit("row-"), col("id")).as("txt"),
      (col("id") * 1.5).as("v")).coalesce(1)
    val out = "/tmp/arrow-export-" + java.util.UUID.randomUUID().toString.take(8)
    try {
      val manifest = ArrowExport.exportArrow(df, out)
      assert(manifest.size == 1 && manifest.head._2 == 20000L)
      val got = readBack(manifest.head._1)
      assert(got.size == 20000)
      assert(got.head == ((Some(0L), Some("row-0"), Some(0.0))))
      assert(got.last == ((Some(19999L), Some("row-19999"), Some(29998.5))))
    } finally graft.meta.GraftFS.deleteRecursive(out)
  }

  test("readArrow round-trips an export (schema inferred, nulls kept)") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "alpha", 1.5), (2L, null, 2.5), (3L, "gamma", null),
      (null.asInstanceOf[java.lang.Long], "delta", 4.5)
    ).toDF("id", "txt", "v").repartition(2)
    val out = "/tmp/arrow-export-" + java.util.UUID.randomUUID().toString.take(8)
    try {
      ArrowExport.exportArrow(df, out)
      val back = ArrowExport.readArrow(spark, out)
      assert(back.schema == df.schema.map(f => f.copy(nullable = true))
        .foldLeft(new org.apache.spark.sql.types.StructType())(_ add _))
      assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    } finally graft.meta.GraftFS.deleteRecursive(out)
  }

  test("NTZ timestamps export as microsecond Arrow timestamps") {
    val df = spark.sql(
      "SELECT 1L AS id, timestamp_ntz'2001-02-03 04:05:06.789012' AS ts").coalesce(1)
    val out = "/tmp/arrow-export-" + java.util.UUID.randomUUID().toString.take(8)
    try {
      val manifest = ArrowExport.exportArrow(df, out)
      val (fs, p) = graft.meta.GraftFS.resolve(manifest.head._1)
      val alloc = new RootAllocator(Long.MaxValue)
      val in = fs.open(p)
      val reader = new ArrowStreamReader(Channels.newChannel(in), alloc)
      try {
        assert(reader.loadNextBatch())
        val v = reader.getVectorSchemaRoot.getVector(1).asInstanceOf[TimeStampMicroVector]
        val expect = java.time.LocalDateTime.parse("2001-02-03T04:05:06.789012")
          .toInstant(java.time.ZoneOffset.UTC)
        assert(v.get(0) == expect.getEpochSecond * 1000000L + expect.getNano / 1000L)
      } finally { reader.close(); in.close(); alloc.close() }
    } finally graft.meta.GraftFS.deleteRecursive(out)
  }

  test("unsupported column types are rejected before any work launches") {
    val df = Seq((1, Array(1, 2))).toDF("a", "arr")
    val e = intercept[IllegalArgumentException] {
      ArrowExport.exportArrow(df, "/tmp/never-written")
    }
    assert(e.getMessage.contains("arr"))
  }
}
