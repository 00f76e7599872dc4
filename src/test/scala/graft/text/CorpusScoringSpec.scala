package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the BM25 formula against a hand computation and the
  * perplexity-bucket contract (score-monotone NTILE tiers).
  */
class CorpusScoringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25 matches the hand-computed Okapi score") {
    // 3 docs; query = {x}; df(x)=2, N=3, dl = 2,3,1, avgdl = 2
    val docs = Seq((1L, "x x"), (2L, "x y z"), (3L, "w"))
      .toDF("doc_id", "text")
    val got = CorpusScoring.bm25Score(docs, "doc_id", "text", Seq("x"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def okapi(tf: Long, dl: Long): Double = {
      val v = idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.0)))
      math.rint(v * 1e6) / 1e6
    }
    assert(got == Map(1L -> ((1L, okapi(2, 2))), 2L -> ((1L, okapi(1, 3)))))
  }

  test("bm25 plan: df/stats ride broadcasts, no sort-merge join anywhere") {
    val docs = (0 until 200).map(i => (i.toLong, s"alpha x$i beta gamma"))
      .toDF("doc_id", "text")
    val plan = CorpusScoring.bm25Score(docs, "doc_id", "text", Seq("alpha", "beta"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"idf/stats joins must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in the bm25 plan should need a sort-merge join:\n$plan")
  }

  test("perplexity buckets are score-monotone NTILE tiers") {
    // 30 docs with varying bigram typicality; tiers must be a partition
    // of the corpus where every doc in a higher bucket scores >= (with
    // doc_id tiebreak) every doc in a lower one.
    val docs = (0 until 30).map { i =>
      val common = "the quick fox " * (1 + i % 5)
      val rare = s"zq$i xw$i "
      (i.toLong, (common + rare).trim)
    }.toDF("doc_id", "text")
    val rows = CorpusScoring.perplexityBuckets(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.length == 30)
    val sizes = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes == Map(1L -> 10, 2L -> 10, 3L -> 10), s"tier sizes: $sizes")
    val sorted = rows.sortBy(r => (r._2, r._1)).map(_._3)
    assert(sorted.sameElements(sorted.sorted),
      "bucket must be monotone in (score, doc_id) order")
  }
}
