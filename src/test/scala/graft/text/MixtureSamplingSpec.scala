package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase budget sampler must equal the naive single-window
  * definition exactly — that window IS the spec (and the oracle shape).
  */
class MixtureSamplingSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // deterministic corpus: 3 domains × uneven doc counts, token counts
  // varied enough that budget boundaries fall mid-bucket
  private def corpus(): DataFrame =
    (1 to 900).map { i =>
      val dom = s"dom${i % 3}"
      val ntok = 1 + (i * 2654435761L % 97).toInt
      (i.toLong, dom, ntok.toLong)
    }.toDF("id", "dom", "ntok")

  private def naive(docs: DataFrame, budgets: Map[String, Long]): Set[Long] = {
    val b = budgets.toSeq.toDF("dom", "budget")
    val w = Window.partitionBy("dom")
      .orderBy(MixtureSampling.orderHash(col("id")), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(b, "dom")
      .withColumn("cum", sum(col("ntok")).over(w))
      .filter(col("cum") <= col("budget"))
      .select("id").as[Long].collect().toSet
  }

  private def sampled(docs: DataFrame, budgets: Map[String, Long]): Set[Long] =
    MixtureSampling.sampleToBudget(docs, "id", "dom", col("ntok"), budgets)
      .select("id").as[Long].collect().toSet

  test("two-phase sampler equals the naive window at mid-corpus budgets") {
    val docs = corpus()
    val budgets = Map("dom0" -> 3000L, "dom1" -> 7000L, "dom2" -> 500L)
    val got = sampled(docs, budgets)
    assert(got == naive(docs, budgets) && got.nonEmpty)
  }

  test("budget edge cases: zero drops the domain, huge keeps it whole, absent drops it") {
    val docs = corpus()
    val total1 = docs.filter($"dom" === "dom1").agg(sum("ntok")).head().getLong(0)
    val budgets = Map("dom0" -> 0L, "dom1" -> (total1 + 1))
    val got = MixtureSampling.sampleToBudget(docs, "id", "dom", col("ntok"), budgets)
      .select("id", "dom").as[(Long, String)].collect()
    assert(got.forall(_._2 == "dom1"))
    assert(got.length == docs.filter($"dom" === "dom1").count())
    assert(got.toSet.map((p: (Long, String)) => p._1) == naive(docs, budgets))
  }

  test("result is invariant to input partitioning") {
    val docs = corpus()
    val budgets = Map("dom0" -> 2000L, "dom1" -> 2000L, "dom2" -> 2000L)
    assert(sampled(docs.repartition(7), budgets) == sampled(docs.coalesce(1), budgets))
  }

  test("mixture weights convert to floor-proportional budgets") {
    val docs = corpus()
    val viaWeights = MixtureSampling.sampleToMixture(docs, "id", "dom",
      col("ntok"), Map("dom0" -> 2.0, "dom1" -> 1.0, "dom2" -> 1.0), 8000L)
      .select("id").as[Long].collect().toSet
    val viaBudgets = sampled(docs,
      Map("dom0" -> 4000L, "dom1" -> 2000L, "dom2" -> 2000L))
    assert(viaWeights == viaBudgets)
  }

  test("upsampleEpochs replicates exactly per the hash gate, tagged 1..copies") {
    val docs = (1 to 300).map(i => (i.toLong, s"text body $i")).toDF("id", "text")
    val out = MixtureSampling.upsampleEpochs(docs, "text", lit(250))
      .select("id", "epoch").as[(Long, Long)].collect()
    // per-doc replay: 2 + (hash % 100 < 50)
    def polyHash(s: String): Long = {
      var h = 0L
      s.getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
      h
    }
    val expected = (1 to 300).flatMap { i =>
      val c = 2 + (if (polyHash(s"text body $i") % 100 < 50) 1 else 0)
      (1 to c).map(e => (i.toLong, e.toLong))
    }.toSet
    assert(out.toSet == expected)
    // rate 40: only the hash-gated 40% survive, all epoch 1
    val down = MixtureSampling.upsampleEpochs(docs, "text", lit(40))
      .select("id", "epoch").as[(Long, Long)].collect()
    assert(down.forall(_._2 == 1L))
    assert(down.length == (1 to 300).count(i => polyHash(s"text body $i") % 100 < 40))
  }
}
