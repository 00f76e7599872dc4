package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multinomial NB reference classifier: hand-checked weights on a tiny
  * corpus, class separation on a vocabulary-split one, and the
  * population/edge contracts (token-less and null docs score nowhere).
  */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("log-odds matches the hand-computed NB value on a tiny corpus") {
    // reference: "good good", crawl: "bad"
    val docs = Seq((1L, "good good", 1), (2L, "bad", 0))
      .toDF("doc_id", "text", "y")
    val got = QualityClassifier
      .naiveBayesScore(docs, "doc_id", "text", col("y") === 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // priors ln(2/2)=0; totPos=2, totNeg=1, V=2
    // llr(good) = ln(3/4) - ln(1/3); llr(bad) = ln(1/4) - ln(2/3)
    val llrGood = math.log(3.0 / 4.0) - math.log(1.0 / 3.0)
    val llrBad = math.log(1.0 / 4.0) - math.log(2.0 / 3.0)
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    assert(got(1L) == ((2L, r6(2 * llrGood), 1L)))
    assert(got(2L) == ((1L, r6(llrBad), 0L)))
  }

  test("separates reference vocabulary from crawl vocabulary") {
    val ref = (0 until 20).map(i => (i.toLong, "wiki facts article cited", 1))
    val crawl = (20 until 40).map(i => (i.toLong, "click spam buy now", 0))
    val held = Seq((100L, "facts article", 0), (101L, "spam buy", 1)) // labels lie
    val docs = (ref ++ crawl ++ held).toDF("doc_id", "text", "y")
    val scored = QualityClassifier
      .naiveBayesScore(docs, "doc_id", "text", col("y") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // held-out docs score by their WORDS, not their (wrong) labels
    assert(scored(100L) > 0, s"reference-vocab doc must score positive: ${scored(100L)}")
    assert(scored(101L) < 0, s"crawl-vocab doc must score negative: ${scored(101L)}")
  }

  test("null and token-less docs are outside the population") {
    val docs = Seq((1L, "alpha beta", 1), (2L, null.asInstanceOf[String], 0),
      (3L, "   ", 0), (4L, "gamma", 0)).toDF("doc_id", "text", "y")
    val ids = QualityClassifier
      .naiveBayesScore(docs, "doc_id", "text", col("y") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 4L))
  }
}
