package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BpeMerges, BpeExpressions}
import BpeExpressions._

/** BPE semantics: the encoder against hand-computed tokenizations, the
  * distributed trainer against an in-memory reference implementation,
  * and the pinned corpus table against a from-scratch retrain.
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  /** In-memory reference trainer — the textbook algorithm, kept
    * deliberately independent of the distributed implementation.
    */
  private def trainLocal(freq: Map[String, Long], n: Int): Vector[(String, String)] = {
    var state = freq.keys.map(w => w -> w.map(String.valueOf(_)).toVector).toMap
    var merges = Vector.empty[(String, String)]
    while (merges.size < n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, toks) <- state; i <- 0 until toks.size - 1)
        counts((toks(i), toks(i + 1))) = counts.getOrElse((toks(i), toks(i + 1)), 0L) + freq(w)
      if (counts.isEmpty) return merges
      val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
      merges = merges :+ best
      state = state.map { case (w, toks) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.size) {
          if (i + 1 < toks.size && toks(i) == best._1 && toks(i + 1) == best._2) {
            out += toks(i) + toks(i + 1); i += 2
          } else { out += toks(i); i += 1 }
        }
        w -> out.result()
      }
    }
    merges
  }

  test("encode merges lowest-rank leftmost pair until fixpoint") {
    val m = BpeMerges(Vector(("a", "b"), ("ab", "c"), ("c", "d")))
    assert(m.encode("abcd").toSeq == Seq("abc", "d")) // ab -> abc beats cd via rank order
    assert(m.encode("cdcd").toSeq == Seq("cd", "cd"))
    assert(m.encode("xyz").toSeq == Seq("x", "y", "z"))
    assert(m.encode("").toSeq == Seq.empty)
    assert(m.encode("a").toSeq == Seq("a"))
  }

  test("corpus table encodes known words as trained") {
    val m = Bpe.corpusMerges
    assert(m.encode("customer").toSeq == Seq("customer"))
    assert(m.encode("the").toSeq == Seq("t", "h", "e"))
    assert(m.encode("spark").toSeq == Seq("s", "par", "k"))
    assert(m.wordTokenCount("vector") == 1)
    assert(m.wordTokenCount("zzz") == 3) // unseen word falls back to chars
  }

  test("bpe_token_count expression equals per-word local encode") {
    val docs = Seq(
      (1L, "the quick spark customer"),
      (2L, "vector vector window"),
      (3L, ""),
      (4L, "   "), // whitespace only
      (5L, "order by key")
    ).toDF("id", "text")
    val got = docs.select($"id", bpe_token_count($"text", Bpe.corpusMerges))
      .as[(Long, Int)].collect().toMap
    def local(t: String) = t.split(" ").filter(_.nonEmpty)
      .map(Bpe.corpusMerges.wordTokenCount).sum
    assert(got(1L) == local("the quick spark customer"))
    assert(got(2L) == local("vector vector window"))
    assert(got(3L) == 0)
    assert(got(4L) == 0)
    assert(got(5L) == local("order by key"))
  }

  test("distributed trainer matches the in-memory reference") {
    val docs = Seq(
      "the cat sat on the mat",
      "the bat and the cat chat",
      "that cat that bat that mat",
      "banana bandana cabana"
    ).toDF("text")
    val freq = docs.as[String].collect()
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val expected = trainLocal(freq, 12)
    val got = Bpe.trainMerges(docs, "text", 12)
    assert(got.pairs == expected)
  }

  test("pinned corpus table reproduces from a retrain on sf0.01 documents") {
    val dir = "/root/testdata/sf0.01/documents.parquet"
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val docs = spark.read.parquet(dir)
    val trained = Bpe.trainMerges(docs, "text", Bpe.corpusMerges.pairs.size)
    assert(trained.pairs == Bpe.corpusMerges.pairs,
      "corpusMerges constant out of sync with the trainer output")
  }
}
