package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The DML delta spool must round-trip every graft column type through
  * an executor-side write and a standard spark.read.parquet.
  */
class DeltaSpoolSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("spooled InternalRows read back exactly (all supported types)") {
    val st = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("l", LongType, nullable = false),
      StructField("s", StringType, nullable = false),
      StructField("b", BinaryType, nullable = true),
      StructField("arr", ArrayType(LongType), nullable = true),
      StructField("m", MapType(StringType, LongType), nullable = true)))
    val rows = Seq(
      Row(1, 10L, "alpha", Array[Byte](1, 2, 3), Seq(1L, 2L), Map("a" -> 1L)),
      Row(2, 20L, "βeta", null, null, null),
      Row(3, 30L, "", Array[Byte](), Seq.empty[Long], Map.empty[String, Long]))
    val dir = Files.createTempDirectory("graft-spool").toString
    val path = s"$dir/part-0.parquet"
    val toInternal = CatalystTypeConverters.createToCatalystConverter(st)
    val w = DeltaSpool.open(path, st, spark.sparkContext.hadoopConfiguration)
    try rows.foreach(r => w.write(
      toInternal(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]))
    finally w.close()

    val got = spark.read.schema(st).parquet(path).collect()
      .sortBy(_.getInt(0)).toSeq
    assert(got.map(_.getInt(0)) == Seq(1, 2, 3))
    assert(got.map(_.getLong(1)) == Seq(10L, 20L, 30L))
    assert(got.map(_.getString(2)) == Seq("alpha", "βeta", ""))
    assert(got(0).getAs[Array[Byte]]("b").toSeq == Seq[Byte](1, 2, 3))
    assert(got(1).isNullAt(3) && got(1).isNullAt(4) && got(1).isNullAt(5))
    assert(got(0).getAs[scala.collection.Seq[Long]]("arr").toSeq == Seq(1L, 2L))
    assert(got(0).getAs[scala.collection.Map[String, Long]]("m").toMap == Map("a" -> 1L))
    assert(got(2).getAs[scala.collection.Seq[Long]]("arr").isEmpty)
  }
}
