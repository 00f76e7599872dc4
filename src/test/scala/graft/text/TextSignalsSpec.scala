package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit checks for the round-6 curation signals: repetition fractions,
  * PII redaction, and the deterministic sampling gate. (The driver rows
  * t8–t11 check the same operators against DuckDB at corpus scale.)
  */
class TextSignalsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("stripMarkup drops script/style with contents, strips tags, decodes entities last") {
    def strip(s: String): String =
      Seq(s).toDF("h").select(TextFunctions.stripMarkup(col("h"))).as[String].head()
    assert(strip("<html><body><p class=\"x\">Hello <b>world</b></p></body></html>")
      == "Hello world")
    // script/style contents vanish entirely, across newlines
    // dropped blocks leave a single space (words must not glue together)
    assert(strip("<style>p {\n color: red }</style>before<script type=\"a\">\nvar x = '<p>';\n</script>after")
      == "before after")
    // decode runs after stripping: decoded angle brackets are DATA
    assert(strip("a &lt;b&gt; c") == "a <b> c")
    // &amp; decodes LAST: &amp;lt; is the literal text "&lt;"
    assert(strip("x &amp;lt; y &amp; z &quot;q&#39;s&quot;") == "x &lt; y & z \"q's\"")
    // whitespace collapses, ends trim
    assert(strip("  <div>\n\ta\n\nb </div>  ") == "a b")
    // mixed-case and unclosed tags
    assert(strip("<SCRIPT>ignore()</SCRIPT><P>kept") == "kept")
  }

  test("top n-gram fraction counts occurrences, not distinct n-grams") {
    // "a b a b a": bigrams = [a b, b a, a b, b a] -> top 2 of 4 = 0.5
    // "x x x x":   bigrams = [x x, x x, x x]      -> top 3 of 3 = 1.0
    val df = Seq((1, "a b a b a"), (2, "x x x x"), (3, "one"), (4, "u v w"))
      .toDF("id", "text")
      .select($"id", TextFunctions.topNgramFraction($"text", 2).as("f"))
    val got = df.as[(Int, Option[Double])].collect().toMap
    assert(got(1).contains(0.5))
    assert(got(2).contains(1.0))
    assert(got(3).isEmpty) // fewer than n tokens -> null
    assert(got(4).contains(0.5)) // all distinct -> 1/m, m = 2 bigrams
  }

  test("duplicate-word fraction is 1 - distinct/total") {
    val f = Seq("a a b" -> 0).toDF("text", "z")
      .select(TextFunctions.dupWordFraction($"text")).as[Double].head()
    assert(math.abs(f - (1.0 - 2.0 / 3)) < 1e-15)
  }

  test("PII redaction replaces emails and phone-shaped digits with typed placeholders") {
    val df = Seq("mail bob.smith+x@corp.example.org or 555-0134 now").toDF("text")
      .select(TextFunctions.redactPii($"text").as("r"),
        struct(TextFunctions.piiCounts($"text").map { case (n, c) => c.as(n) }: _*).as("c"))
    val (r, c) = df.as[(String, (Long, Long))].head()
    assert(r == "mail <EMAIL> or <PHONE> now")
    assert(c == ((1L, 1L)))
  }

  test("phone digits inside an email are not double-counted") {
    val (r, nPhones) = Seq("x 123-4567@example.com y").toDF("text")
      .select(TextFunctions.redactPii($"text").as("r"),
        TextFunctions.piiCounts($"text").toMap.apply("n_phones").as("p"))
      .as[(String, Long)].head()
    assert(r == "x <EMAIL> y")
    assert(nPhones == 0L)
  }

  test("distributed sequence packing equals the single-window global prefix sum") {
    // 200 docs with varying token counts across several range partitions
    val docs = (1 to 200).map(i => (i.toLong, ("w " * (1 + i % 13)).trim)).toDF("id", "text")
    val got = SequencePacking.packContiguous(docs, "id", "text",
      budgetTokens = 50, partitions = 7)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    // reference: sequential greedy packing
    var run = 0L
    val expected = (1 to 200).map { i =>
      val ntok = 1 + i % 13
      val bin = run / 50
      run += ntok
      i.toLong -> bin
    }.toMap
    assert(got == expected)

    // the eager variant materializes the same assignment and leaves no
    // cached intermediate behind
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val eager = SequencePacking.packContiguousEager(docs, "id", "text",
      budgetTokens = 50, partitions = 7)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(eager == expected)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    // localCheckpoint keeps the RESULT cached by design; the packing
    // intermediate (the wide __lsum frame) must be gone
    val leakedCols = leaked.flatMap(spark.sparkContext.getPersistentRDDs.get)
      .map(_.name).mkString(",")
    assert(!leakedCols.contains("__lsum"), s"intermediate still cached: $leakedCols")
  }

  test("bigram LM score matches a hand-computed model; short docs excluded") {
    // corpus: "a b a b" (bigrams: a·b ×2, b·a ×1), "a b" (a·b ×1), "x" (none)
    // counts: c(a b)=3, c(b a)=1; contexts: c(a·)=3, c(b·)=1; V=2 — the
    // model vocabulary is the bigram table's words {a, b}: "x" occurs
    // only as a 1-word doc, enters no bigram, and carries no smoothing
    // mass (no corpus scan is spent counting it)
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val got = CorpusScoring.lmBigramScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "lm_score")
      .as[(Long, Long, Double)].collect()
    val v = 2.0
    val pAB = math.log((3 + 0.5) / (3 + 0.5 * v)) // P(b|a)
    val pBA = math.log((1 + 0.5) / (1 + 0.5 * v)) // P(a|b)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // the 1-word doc is excluded
    assert(got(0)._2 == 3 && got(1)._2 == 1)
    assert(math.abs(got(0)._3 - r6((2 * pAB + pBA) / 3)) < 1e-9)
    assert(math.abs(got(1)._3 - r6(pAB)) < 1e-9)
  }

  test("duplicated spans: cross-doc 4-grams flagged, within-doc repeats are one span") {
    val docs = Seq(
      (1L, "the cat sat on the mat today"),      // spans: 4 distinct
      (2L, "the cat sat on a very soft mat"),    // shares "the cat sat on"
      (3L, "x y z w x y z w")                    // self-repeat only
    ).toDF("doc_id", "text")
    val got = CorpusScoring.duplicateSpans(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "n_dup_spans")
      .as[(Long, Long, Long)].collect().toSeq
    // doc1: windows = 4 ("the cat sat on", "cat sat on the", "sat on the mat",
    // "on the mat today"); only the first is shared (with doc2)
    assert(got(0) == ((1L, 4L, 1L)))
    assert(got(1) == ((2L, 5L, 1L)))
    // doc3: 5 windows but "x y z w" repeats → 4 distinct; none shared
    // with another doc — zero dup spans (within-doc repetition is t8's
    // signal, not this one's)
    assert(got(2) == ((3L, 4L, 0L)))
  }

  test("char_entropy matches closed-form values and a direct replay") {
    import graft.functions.HashExpressions.char_entropy
    val got = Seq("aaaa", "ab", "abcd", "aabb", "").toDF("t")
      .select(char_entropy($"t")).as[Option[Double]].collect()
    assert(got(0).get == 0.0)
    assert(math.abs(got(1).get - 1.0) < 1e-12)
    assert(math.abs(got(2).get - 2.0) < 1e-12)
    assert(math.abs(got(3).get - 1.0) < 1e-12)
    assert(got(4).isEmpty) // empty text -> null
    // direct replay on arbitrary text
    val s = "the quick brown fox jumps over the lazy dog 0123"
    val hist = s.getBytes("UTF-8").groupBy(identity).view.mapValues(_.length).toMap
    val n = s.length.toDouble
    val expected = -hist.values.map(c => c / n * math.log(c / n)).sum / math.log(2)
    val one = Seq(s).toDF("t").select(char_entropy($"t")).as[Double].head()
    assert(math.abs(one - expected) < 1e-12)
  }

  test("deflate_ratio separates redundant from high-entropy text, deterministically") {
    import graft.functions.HashExpressions.deflate_ratio
    val redundant = "spam " * 400
    val rnd = new scala.util.Random(42)
    val varied = (0 until 2000).map(_ => (rnd.nextInt(93) + 33).toChar).mkString
    val rows = Seq(("r", redundant), ("v", varied), ("e", ""))
      .toDF("k", "t")
      .select($"k", deflate_ratio($"t").as("r"))
      .as[(String, Option[Double])].collect().toMap
    assert(rows("e").isEmpty)
    assert(rows("r").get < 0.05, s"redundant ratio ${rows("r")}")
    assert(rows("v").get > 0.5, s"varied ratio ${rows("v")}")
    // deterministic across partitions/runs
    val again = Seq(redundant).toDF("t").repartition(3)
      .select(deflate_ratio($"t")).as[Double].head()
    assert(again == rows("r").get)
  }

  test("sampling gate is deterministic and honors the rate column") {
    val docs = (1 to 400).map(i => (i, s"document number $i text")).toDF("id", "text")
    val keep100 = docs.filter(TextFunctions.sampleByRate($"text", lit(100)))
    val keep0 = docs.filter(TextFunctions.sampleByRate($"text", lit(0)))
    assert(keep100.count() == 400 && keep0.count() == 0)
    val a = docs.filter(TextFunctions.sampleByRate($"text", lit(40)))
      .select("id").as[Int].collect().toSet
    val b = docs.repartition(7).filter(TextFunctions.sampleByRate($"text", lit(40)))
      .select("id").as[Int].collect().toSet
    assert(a == b) // partitioning-independent
    assert(a.size > 80 && a.size < 240) // roughly 40%, hash not degenerate
  }

  test("gopherRules: each rule fires on its crafted violation") {
    import org.apache.spark.sql.functions.col
    def rules(text: String): Map[String, Any] = {
      val rs = TextFunctions.gopherRules(col("t"))
      val row = Seq(text).toDF("t")
        .select(rs.map { case (n, c) => c.as(n) }: _*).head()
      rs.map(_._1).zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
    }
    val good = (("the data be available to all of us and that have with " * 10).trim)
    val g = rules(good)
    assert(g("n_words") == 120L)
    assert(Seq("ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
      "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words", "ok_stopwords")
      .forall(k => g(k) == true), s"good doc failed a rule: $g")

    assert(rules("too short")("ok_word_count") == false)
    assert(rules(("a " * 100).trim)("ok_mean_word_len") == false) // mean len 1
    assert(rules(("word " * 99) + ("#" * 11))("ok_symbol_ratio") == false) // 11/100 > 0.1
    assert(rules((1 to 20).map(i => s"- bullet $i").mkString("\n"))("ok_bullet_lines") == false)
    assert(rules((1 to 20).map(i => s"line $i trails off...").mkString("\n"))("ok_ellipsis_lines") == false)
    assert(rules(("123 456 " * 50).trim)("ok_alpha_words") == false)
    assert(rules(("lorem ipsum dolor sit amet " * 20).trim)("ok_stopwords") == false)
  }
}
