package graft.vectors

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.BqExpressions._
import graft.functions.BqOps

/** Binary (sign-bit) quantization: bit packing, Hamming popcount, the
  * full-rerank-equals-brute pin, and recall at realistic rerank depth.
  */
class BqSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("bq_encode packs sign bits LSB-first with zero pad bits") {
    val df = Seq(
      (1L, Array(1.0f, -1.0f, 0.0f, -0.5f, 2.0f, -3.0f, 4.0f, -5.0f, 6.0f)),
      (2L, Array(-1.0f, -1.0f, -1.0f))).toDF("id", "v")
    val enc = df.select(col("id"), bq_encode(col("v")).as("c"))
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    // dims 0,2,4,6 nonnegative (0.0 counts as +), dim 8 in byte 1
    assert(enc(0)._2.toSeq == Seq[Byte]((1 + 4 + 16 + 64).toByte, 1))
    assert(enc(1)._2.toSeq == Seq[Byte](0))
  }

  test("bq_hamming equals per-dimension sign disagreement count (incl >8-byte codes)") {
    val rnd = new scala.util.Random(11)
    val a = Array.fill(100)(rnd.nextFloat() - 0.5f)
    val b = Array.fill(100)(rnd.nextFloat() - 0.5f)
    val expected = a.zip(b).count { case (x, y) => (x >= 0) != (y >= 0) }.toLong
    val got = Seq((a, b)).toDF("a", "b")
      .select(bq_hamming(bq_encode(col("a")), bq_encode(col("b"))))
      .as[Long].head()
    assert(got == expected)
    // and the direct op agrees (word loop + byte tail both exercised)
    assert(BqOps.hamming(
      Seq(a).toDF("v").select(bq_encode(col("v"))).as[Array[Byte]].head(),
      Seq(b).toDF("v").select(bq_encode(col("v"))).as[Array[Byte]].head()) == expected)
  }

  test("knnBinary with rerank >= corpus equals exact brute-force top-k") {
    val rnd = new scala.util.Random(23)
    val corpus = (1L to 300L).map { i =>
      (i, Array.fill(16)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "emb")
    val query = Seq((0L, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "emb")
    val bq = VectorFunctions.knnBinary(corpus, "vec_id", "emb", query, "emb",
        k = 10, rerank = 300)
      .select("id").as[Long].collect().toSeq
    val brute = VectorFunctions.knnBrute(corpus, "vec_id", "emb", query, "emb", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(bq == brute, s"full-rerank BQ must equal brute: $bq vs $brute")
  }

  test("knnBinary recall@10 >= 0.9 at rerank=100 on clustered vectors") {
    val rnd = new scala.util.Random(5)
    val corpus = (1L to 500L).map { i =>
      val c = (i % 5).toInt
      (i, Array.tabulate(32)(d =>
        (if (d % 5 == c) 1.0f else -0.2f) + (rnd.nextFloat() - 0.5f) * 0.3f))
    }.toDF("vec_id", "emb")
    val query = Seq((0L, Array.tabulate(32)(d => if (d % 5 == 2) 1.0f else -0.2f)))
      .toDF("vec_id", "emb")
    val bq = VectorFunctions.knnBinary(corpus, "vec_id", "emb", query, "emb",
        k = 10, rerank = 100)
      .select("id").as[Long].collect().toSet
    val brute = VectorFunctions.knnBrute(corpus, "vec_id", "emb", query, "emb", k = 10)
      .select("id").as[Long].collect().toSet
    val recall = (brute intersect bq).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall; brute=$brute bq=$bq")
  }
}
