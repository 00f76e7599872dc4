package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Leakage-safe splitting: no near-dup pair crosses splits, every doc is
  * assigned exactly once, assignment is deterministic, and proportions
  * land near the requested percentages.
  */
class DatasetSplitSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // 200 base docs with distinct vocabularies; every third doc gets a
  // near-identical twin (one word changed) and every tenth an exact copy
  private def corpus = {
    val base = (0L until 200L).map { i =>
      val words = (0 until 30).map(w => s"w${i}_$w").mkString(" ")
      (i, words)
    }
    val twins = base.collect { case (i, t) if i % 3 == 0 =>
      (1000L + i, t.replace(s"w${i}_7", "changed"))
    }
    val copies = base.collect { case (i, t) if i % 10 == 0 => (2000L + i, t) }
    (base ++ twins ++ copies).toDF("doc_id", "text")
  }

  test("near-dup pairs never cross the split boundary; assignment is total and deterministic") {
    val docs = corpus
    val split = DatasetSplit.leakageSafeSplit(docs, "doc_id", "text").cache()
    assert(split.count() == docs.count())
    assert(split.select("doc_id").distinct().count() == docs.count())

    // ground-truth near-dup pairs (exact Jaccard at the same threshold)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.5)
    assert(pairs.count() >= 80, "fixture must actually contain near-dups")
    val crossed = pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb"))
    assert(crossed.count() == 0, "a near-dup pair crossed the train/eval boundary")

    // twins share their base's cluster id and split
    val m = split.select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1000L + 9L) == m(9L))
    assert(m(2000L + 10L) == m(10L))

    // deterministic replay
    val again = DatasetSplit.leakageSafeSplit(docs, "doc_id", "text")
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(again == m)
    split.unpersist()
  }

  test("proportions approximate the requested percentages over many clusters") {
    val docs = (0L until 2000L).map { i =>
      (i, (0 until 10).map(w => s"u${i}_$w").mkString(" "))
    }.toDF("doc_id", "text")
    val counts = DatasetSplit.leakageSafeSplit(docs, "doc_id", "text")
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 1600L) < 120, s"train: $counts")
    assert(math.abs(counts.getOrElse("validation", 0L) - 200L) < 80, s"val: $counts")
    assert(math.abs(counts.getOrElse("test", 0L) - 200L) < 80, s"test: $counts")
  }

  test("invalid percentages are rejected") {
    intercept[IllegalArgumentException](
      DatasetSplit.leakageSafeSplit(corpus, "doc_id", "text", trainPct = 95, valPct = 10))
  }
}
