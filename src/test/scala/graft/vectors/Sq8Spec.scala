package graft.vectors

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Sq8Expressions._

/** SQ8 scalar quantization: codes bounded, extremes map to ±127, the
  * integer dot matches plain arithmetic, and the serving path agrees
  * with an unquantized replay on separable data.
  */
class Sq8Spec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("codes are bounded int8 with extremes at ±127; zero vector scores 0") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(2.0f, 1.0f, -2.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val enc = df.select(col("id"), sq8_encode(col("v")).as("c"), sq8_scale(col("v")).as("s"))
      .as[(Long, Array[Byte], Double)].collect().sortBy(_._1)
    assert(enc(0)._2.toSeq == Seq[Byte](64, -127, 32))
    assert(enc(0)._3 == 127.0)
    assert(enc(1)._2.toSeq == Seq[Byte](127, 64, -127))
    assert(enc(2)._2.forall(_ == 0) && enc(2)._3 == 0.0)
  }

  test("sq8_dot equals integer arithmetic over the codes") {
    val df = Seq(
      (Array(0.5f, -1.0f, 0.25f), Array(2.0f, 1.0f, -2.0f))).toDF("a", "b")
    val got = df.select(sq8_dot(sq8_encode(col("a")), sq8_encode(col("b"))))
      .as[Long].head()
    // codes: (64, -127, 32) · (127, 64, -127)
    assert(got == 64L * 127 - 127L * 64 - 32L * 127)
  }

  test("knnIvfSq8 with full probe + rerank equals exact brute-force top-k") {
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 200L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(8)(d => (if (d == c * 2) 1.0f else 0.1f) + rnd.nextFloat() * 0.05f))
    }.toDF("vec_id", "emb")
    val query = Seq((0L, Array.tabulate(8)(d => if (d == 2) 1.0f else 0.1f)))
      .toDF("vec_id", "emb")
    val cents = VectorFunctions.trainKmeansCentroids(corpus, "vec_id", "emb", k = 4)
    val ivf = VectorFunctions.knnIvfSq8(corpus, "vec_id", "emb", query, "emb",
        k = 10, cents, nprobe = 4, rerank = 64)
      .select("id").as[Long].collect().toSeq
    val brute = VectorFunctions.knnBrute(corpus, "vec_id", "emb", query, "emb", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(ivf == brute, s"IVF-SQ8 full-probe must equal brute: $ivf vs $brute")
  }

  test("knnSq8 ranks separable clusters like exact inner product") {
    // query near e1; cluster A along e1, cluster B along e2
    val corpus = ((1L to 10L).map(i => (i, Array(1.0f + i * 0.01f, 0.05f))) ++
      (11L to 20L).map(i => (i, Array(0.05f, 1.0f + i * 0.01f)))).toDF("vec_id", "emb")
    val query = Seq((0L, Array(1.0f, 0.1f))).toDF("vec_id", "emb")
    val top = VectorFunctions.knnSq8(corpus, "vec_id", "emb", query, "emb", k = 10)
      .select("id").as[Long].collect().toSet
    assert(top == (1L to 10L).toSet, s"SQ8 top-10 should be cluster A, got $top")
  }
}
