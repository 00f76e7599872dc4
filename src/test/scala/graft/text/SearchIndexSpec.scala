package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The index-served BM25 must be BIT-EQUAL to the direct corpus scan
  * ([[CorpusScoring.bm25Score]]) — that equality is the operator's
  * definition — and must stay equal after an incremental append.
  */
class SearchIndexSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def corpus(ids: Range): DataFrame =
    ids.map { i =>
      val topic = Seq("spark", "merge", "window", "scan", "filter", "join")
      val filler = Seq("the", "a", "of", "data", "rows")
      // (i+j)%3 gate with a +3 stride covers all six topic words
      // across docs (a %4 gate would pin the index parity and starve
      // half the vocabulary)
      val words = (0 until (5 + i % 23)).map { j =>
        if ((i + j) % 3 == 0) topic((i * 3 + j) % 6) else filler((i + j * 7) % 5)
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")

  private def direct(df: DataFrame, terms: Seq[String], k: Int): Seq[(Long, Long, Double)] =
    CorpusScoring.bm25Score(df, "doc_id", "text", terms)
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq

  test("index-served BM25 equals the direct corpus scan bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-si").toString
    val df = corpus(0 until 400)
    SearchIndex.build(df, "doc_id", "text", dir)
    val terms = Seq("spark", "merge", "window")
    val served = SearchIndex.searchBm25(spark, dir, terms, k = 25)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(served == direct(df, terms, 25))
    assert(served.nonEmpty)
  }

  test("append keeps served scores equal to a direct scan of the union") {
    val dir = java.nio.file.Files.createTempDirectory("graft-si2").toString
    SearchIndex.build(corpus(0 until 200), "doc_id", "text", dir)
    SearchIndex.append(corpus(200 until 350), "doc_id", "text", dir)
    val terms = Seq("scan", "join")
    val served = SearchIndex.searchBm25(spark, dir, terms, k = 30)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(served == direct(corpus(0 until 350), terms, 30))
    // and the appended half is actually reachable (full retrieval)
    val all = SearchIndex.searchBm25(spark, dir, terms, k = 1000)
      .as[(Long, Long, Double)].collect()
    assert(all.exists(_._1 >= 200))
  }

  test("compaction folds the appended postings runs; serving is unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-si4").toString
    SearchIndex.build(corpus(0 until 200), "doc_id", "text", dir)
    SearchIndex.append(corpus(200 until 300), "doc_id", "text", dir)
    val terms = Seq("window", "filter")
    val before = SearchIndex.searchBm25(spark, dir, terms, k = 15)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    graft.table.GraftTable.load(spark, dir).compactAll()
    val after = SearchIndex.searchBm25(spark, dir, terms, k = 15)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(after == before)
    assert(after == direct(corpus(0 until 300), terms, 15))
  }

  test("stopword elision drops only hot terms; cold-term scores are untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-si5").toString
    // "the" appears in every doc; topic terms stay rare
    val df = corpus(0 until 200)
      .withColumn("text", concat(lit("the the "), col("text")))
    SearchIndex.build(df, "doc_id", "text", dir, maxDfFraction = 0.5)
    // elided term retrieves nothing
    assert(SearchIndex.searchBm25(spark, dir, Seq("the"), k = 5).count() == 0)
    // a cold term scores exactly as the direct scan over the SAME corpus
    // (N/avgdl in the sidecar still describe the full corpus)
    val served = SearchIndex.searchBm25(spark, dir, Seq("merge"), k = 10)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(served == direct(df, Seq("merge"), 10))
    assert(served.nonEmpty)
  }

  test("hybrid RRF: both-list docs outrank single-list docs at equal ranks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-si6").toString
    val df = corpus(0 until 300)
    SearchIndex.build(df, "doc_id", "text", dir)
    // embeddings: doc 7's vector is the query direction; doc 7 also
    // carries the query terms, so it must fuse to the top
    val rnd = new scala.util.Random(7)
    val q = Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
    val vecs = (0 until 300).map { i =>
      val v =
        if (i == 7) q.map(x => x + 0.01f)
        else Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val boosted = df.withColumn("text",
      when(col("doc_id") === 7, concat(lit("spark merge window "), col("text")))
        .otherwise(col("text")))
    val dir2 = java.nio.file.Files.createTempDirectory("graft-si7").toString
    SearchIndex.build(boosted, "doc_id", "text", dir2)
    val fused = SearchIndex.hybridRrf(spark, dir2, Seq("spark", "merge", "window"),
        vecs.filter($"vec_id" =!= 1000L), "vec_id", "embedding",
        Seq(1000L -> q).toDF("vec_id", "embedding"), "embedding", k = 10)
      .as[(Long, Double)].collect()
    assert(fused.head._1 == 7L, s"doc 7 should fuse to rank 1: ${fused.toSeq}")
    // deterministic
    val again = SearchIndex.hybridRrf(spark, dir2, Seq("spark", "merge", "window"),
        vecs.filter($"vec_id" =!= 1000L), "vec_id", "embedding",
        Seq(1000L -> q).toDF("vec_id", "embedding"), "embedding", k = 10)
      .as[(Long, Double)].collect()
    assert(fused.toSeq == again.toSeq)
  }

  test("append stats survive a crash in every window of the intent protocol") {
    val dir = java.nio.file.Files.createTempDirectory("graft-si8").toString
    def stats = graft.meta.GraftFS.readString(s"$dir/corpus-stats.json")
    def field(src: String, name: String): Long =
      src.split(s""""$name":""")(1).trim.takeWhile(c => c.isDigit || c == '-').toLong
    SearchIndex.build(corpus(0 until 200), "doc_id", "text", dir)
    val s0 = stats
    SearchIndex.append(corpus(200 until 350), "doc_id", "text", dir)
    val s1 = stats
    val pending = s"$dir/corpus-stats.pending.json"

    // window: intent written but the ingest never committed (txn id
    // beyond the marker) — the bogus delta must NOT be served
    graft.meta.GraftFS.writeString(pending, """{"txn": 999, "n": 12345, "sum_dl": 99999}""")
    assert(SearchIndex.corpusStats(spark, dir)._1 == field(s1, "n"))

    // window: torn intent file — resolves to "never started", no throw
    graft.meta.GraftFS.writeString(pending, """{"txn": 9""")
    assert(SearchIndex.corpusStats(spark, dir)._1 == field(s1, "n"))

    // window: ingest committed (txn 1 is in the marker) but finalize
    // never ran — reconstruct that exact state and require the delta to
    // be folded in at read time
    graft.meta.GraftFS.writeString(s"$dir/corpus-stats.json", s0)
    graft.meta.GraftFS.writeString(pending,
      s"""{"txn": 1, "n": ${field(s1, "n") - field(s0, "n")}, "sum_dl": ${field(s1, "sum_dl") - field(s0, "sum_dl")}}""")
    val (n, avgdl) = SearchIndex.corpusStats(spark, dir)
    assert(n == field(s1, "n"))
    assert(math.abs(avgdl - field(s1, "sum_dl").toDouble / field(s1, "n")) < 1e-12)
    // serving through the folded stats equals the direct scan
    val terms = Seq("scan", "join")
    val served = SearchIndex.searchBm25(spark, dir, terms, k = 30)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(served == direct(corpus(0 until 350), terms, 30))

    // the next append settles the abandoned intent durably first
    SearchIndex.append(corpus(350 until 400), "doc_id", "text", dir)
    assert(!graft.meta.GraftFS.exists(pending))
    val served2 = SearchIndex.searchBm25(spark, dir, terms, k = 30)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(served2 == direct(corpus(0 until 400), terms, 30))
  }

  test("duplicate query terms do not double-count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-si3").toString
    val df = corpus(0 until 100)
    SearchIndex.build(df, "doc_id", "text", dir)
    val a = SearchIndex.searchBm25(spark, dir, Seq("spark", "spark"), k = 10)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(a == direct(df, Seq("spark"), 10))
  }
}
