package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The distributed two-phase rank must agree EXACTLY with the
  * single-reducer window it replaces — same row numbers, same NTILE
  * buckets — on shuffled input and across the n % buckets edge cases.
  */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withRowNumber equals the single-reducer window row_number") {
    val df = spark.range(0, 1000).select(
      (col("id") * 2654435761L % 1000).as("k"), col("id"))
      .repartition(7) // scrambled physical layout
    val (ranked, n) = GlobalRank.withRowNumber(df, Seq(col("k"), col("id")), "rn")
    assert(n == 1000L)
    val got = ranked.select(col("id"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("id")))
        .cast("long"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rn")).toMap
    assert(got == expect)
  }

  test("withNtile equals SQL NTILE across remainder edge cases") {
    for (n <- Seq(1, 2, 3, 9, 10, 11); b <- Seq(1, 3, 4)) {
      val df = spark.range(0, n).select(col("id")).repartition(3)
      val got = GlobalRank.withNtile(df, Seq(col("id")), b, "bkt")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bkt")).toMap
      df.createOrReplaceTempView("gr_nt")
      val expect = spark.sql(
          s"SELECT id, CAST(NTILE($b) OVER (ORDER BY id) AS BIGINT) AS bkt FROM gr_nt")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"n=$n b=$b")
    }
  }

  test("empty input ranks to an empty frame with total 0") {
    val df = spark.range(0).select(col("id"))
    val (ranked, n) = GlobalRank.withRowNumber(df, Seq(col("id")), "rn")
    assert(n == 0L && ranked.count() == 0L)
  }
}
