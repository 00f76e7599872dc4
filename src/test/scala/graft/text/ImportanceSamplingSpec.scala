package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR selection must (a) equal an independent in-memory replay of the
  * hashed-bigram importance-weight definition, and (b) actually prefer
  * target-like documents — selection that doesn't enrich the target
  * style would be a correctly-computed useless operator.
  */
class ImportanceSamplingSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // two vocabularies: "target-ish" docs repeat science words, raw noise
  // docs repeat web-boilerplate words; a handful mix both
  private def corpus(): DataFrame =
    (0 until 300).map { i =>
      val sci = Seq("atoms", "energy", "quantum", "field", "mass")
      val web = Seq("click", "subscribe", "cookie", "login", "menu")
      val words =
        if (i % 3 == 0) (0 until 20).map(j => sci((i + j) % 5))
        else if (i % 3 == 1) (0 until 20).map(j => web((i * 2 + j) % 5))
        else (0 until 20).map(j => if (j % 2 == 0) sci(j % 5) else web((i + j) % 5))
      (i.toLong, words.mkString(" "), if (i % 3 == 0) "tgt" else "raw")
    }.toDF("id", "text", "kind")

  private def polyBucket(s: String, buckets: Int): Int = {
    var h = 0L
    s.getBytes("UTF-8").foreach { b => h = (h * 31 + (b & 0xff)) % 1000000007L }
    (h % buckets).toInt
  }

  /** Independent replay: per-doc sum of ln p̂_t(b) − ln p̂_r(b). */
  private def replayWeights(rows: Seq[(Long, String, String)], buckets: Int)
      : Map[Long, (Long, Double)] = {
    def grams(t: String): Seq[Int] = {
      val ws = t.split(" ").filter(_.nonEmpty)
      ws.sliding(2).filter(_.length == 2).map(g => polyBucket(g.mkString(" "), buckets)).toSeq
    }
    val occ = rows.flatMap { case (id, t, kind) => grams(t).map(b => (id, kind, b)) }
    val ct = occ.filter(_._2 == "tgt").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cr = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tt = ct.values.sum; val tr = cr.values.sum
    occ.groupBy(_._1).map { case (id, os) =>
      val w = os.map { case (_, _, b) =>
        math.log((ct.getOrElse(b, 0L) + 1.0) / (tt + buckets)) -
          math.log((cr(b) + 1.0) / (tr + buckets))
      }.sum
      id -> (os.size.toLong,
        BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("dsirWeights equals the in-memory definition") {
    val df = corpus()
    val rows = df.as[(Long, String, String)].collect().toSeq
    val expected = replayWeights(rows, buckets = 512)
    val got = ImportanceSampling
      .dsirWeights(df, "id", "text", col("kind") === "tgt", buckets = 512)
      .as[(Long, Long, Double)].collect().map { case (id, n, w) => id -> (n, w) }.toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (n, w)) =>
      assert(n == expected(id)._1, s"doc $id gram count")
      assert(math.abs(w - expected(id)._2) < 2e-6, s"doc $id weight $w vs ${expected(id)._2}")
    }
  }

  test("selection enriches the target style and ranks deterministically") {
    val df = corpus()
    val k = 120
    val sel = ImportanceSampling
      .dsirSelect(df, "id", "text", col("kind") === "tgt", k = k, buckets = 512)
      .join(df.select("id", "kind"), "id")
      .as[(Long, Long, Double, Long, String)].collect()
    assert(sel.length == k)
    // ranks are exactly 1..k under (weight desc, id)
    assert(sel.map(_._4).sorted.toSeq == (1L to k).toSeq)
    val sorted = sel.sortBy(_._4)
    assert(sorted.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._1 < b._1) })
    // 100 pure-target docs exist; all must outrank every pure-noise doc
    val kinds = sorted.map(_._5)
    assert(kinds.count(_ == "tgt") == 100)
    assert(kinds.take(100).forall(_ == "tgt"), "target docs must fill the top ranks")
  }
}
