package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.HashExpressions

/** Text-analysis primitives for large-scale corpus pipelines:
  * tokenization, word n-gram shingles, MinHash signatures, language-ID
  * and quality heuristics.
  *
  * The hash-family primitives (minhash, simhash, band hashes, shingle
  * sets) are native Catalyst expressions with whole-stage codegen
  * (`graft.functions.HashExpressions`). The remaining combinators use
  * Spark built-ins; note that higher-order functions
  * (`transform`/`aggregate`/`filter`) are `CodegenFallback`
  * (interpreted) in Spark — fine for the single-pass uses here, fatal
  * for per-row k-pass hash loops (round-1 lesson, VERDICT.md).
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** BPE-ish token count: words plus standalone punctuation runs — the
    * usual pre-tokenizer regex shape, counted without materializing
    * tokens anywhere off the executor.
    */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"""), lit(0)))

  /** Distinct word n-gram shingles (the set used for Jaccard); empty
    * array when the document has fewer than n tokens. Native codegen
    * expression — one pass per row.
    */
  def shingleSet(text: Column, n: Int): Column = HashExpressions.word_shingle_set(text, n)

  /** MinHash signature of a shingle set: k min-hashes from the
    * Kirsch–Mitzenmacher construction, one compiled pass over the set
    * (native Catalyst expression with codegen).
    */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    HashExpressions.minhash_signature(shingleSet, k)

  /** LSH band hashes: signature split into `bands` bands of `rows`
    * values, each hashed; docs sharing any band hash become candidates.
    * Native codegen expression.
    */
  def bandHashes(signature: Column, bands: Int, rows: Int): Column =
    HashExpressions.band_hashes(signature, bands, rows)

  /** Exact Jaccard similarity of two string-array sets. The shared
    * intersect subexpression appears once so codegen subexpression
    * elimination computes it once per row.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** SimHash (64-bit): per bit, sum +1/-1 weighted by each distinct
    * token's hash bit; bit set iff the sum is positive. Native codegen
    * expression over the distinct-token array.
    */
  def simhash(text: Column): Column =
    HashExpressions.simhash64(array_distinct(tokens(text)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"))

  /** Deterministic corpus split assignment ("train"/"heldout") from the
    * document fingerprint: stable across runs, machines, and partitions
    * (no RNG), reproducible in plain SQL — the standard hash-based
    * held-out split of a training-data pipeline. `trainPct` of the hash
    * space goes to "train".
    */
  def hashSplit(text: Column, trainPct: Int): Column =
    when(pmod(graft.functions.RollingHash.rolling_hash(text), lit(100)) < trainPct,
      lit("train")).otherwise(lit("heldout"))

  /** Repetition signal (Gopher §A.1.1-style): fraction of word n-gram
    * occurrences taken by the most frequent n-gram; null for texts with
    * fewer than n tokens. Native one-pass codegen expression — no
    * explode/shuffle, so it prices like any scalar at 100 TB.
    */
  def topNgramFraction(text: Column, n: Int): Column =
    HashExpressions.top_ngram_fraction(text, n)

  /** Repetition signal: fraction of token occurrences that are repeats
    * of an earlier token (1 - distinct/total); null on empty texts.
    */
  def dupWordFraction(text: Column): Column = {
    val toks = tokens(text)
    lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks)
  }

  private val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val PhoneRe = """\d{3}-\d{4}"""

  /** Strip HTML/XML markup down to visible text — the first transform a
    * web-crawl corpus needs before any quality/dedup signal: script and
    * style blocks drop WITH their contents, remaining tags drop, the
    * six standard entities decode (`&amp;` last, so `&amp;lt;` yields
    * the literal text `&lt;` instead of double-decoding — and decode
    * runs AFTER tag-stripping, so decoded angle brackets are data, not
    * markup), and whitespace collapses. Pure regexp/replace chain: no
    * UDF (stays inside whole-stage codegen) and every pattern is
    * RE2-compatible, so an independent engine replays it verbatim (the
    * whitespace class is spelled explicitly — Java's `\s` and RE2's
    * differ on vertical tab).
    */
  def stripMarkup(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }

  /** PII redaction: emails then phone-shaped digit groups replaced by
    * typed placeholder tokens. Both patterns are RE2-compatible so an
    * independent engine (the DuckDB oracle) replays them verbatim;
    * `regexp_replace` is codegen'd, so redaction runs inside
    * whole-stage codegen.
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** Redaction counts (emails, phones) for audit columns. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"),
    "n_phones" -> size(regexp_extract_all(regexp_replace(text, EmailRe, "<EMAIL>"),
      lit(PhoneRe), lit(0))).cast("long"))

  /** Deterministic weighted sampling gate: keep a row iff its text
    * fingerprint lands under `ratePct` (a per-row Column, 0–100). The
    * domain-mixing primitive: per-source rates pick the corpus blend,
    * and the hash gate makes the sample reproducible across runs,
    * partitionings, and engines (the oracle replays it in SQL) —
    * no RNG, no sampling state.
    */
  def sampleByRate(text: Column, ratePct: Column): Column =
    pmod(graft.functions.RollingHash.rolling_hash(text), lit(100)) < ratePct

  /** Stopword hits for one language (distinct tokens ∩ stopword list). */
  def stopwordHits(text: Column, lang: String): Column =
    size(array_intersect(array_distinct(tokens(text)),
      array(stopwords(lang).map(lit): _*)))

  /** n-gram/stopword language-ID heuristic: argmax of per-language
    * stopword hits with a fixed tie order (en > de > es > fr), "und" =
    * undetermined when nothing matches.
    */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, "en"); val de = stopwordHits(text, "de")
    val es = stopwordHits(text, "es"); val fr = stopwordHits(text, "fr")
    when(en === 0 && de === 0 && es === 0 && fr === 0, "und")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Quality heuristics: token count, type-token ratio, mean word
    * length, alpha ratio, stopword ratio — the standard cheap corpus
    * quality signals.
    */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val n = size(toks)
    val distinctN = size(array_distinct(toks))
    val chars = length(text)
    val alpha = length(regexp_replace(text, "[^A-Za-z]", ""))
    Seq(
      "n_tokens" -> n.cast("long"),
      "type_token_ratio" -> (distinctN.cast("double") / n),
      "mean_token_len" -> (aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / n),
      "alpha_ratio" -> (alpha.cast("double") / chars),
      "stopword_ratio" -> (stopwordHits(text, "en").cast("double") / distinctN))
  }

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1, the
    * standard web-corpus pre-filter): each rule is a boolean column, the
    * conjunction is the keep decision. All signals are single-pass over
    * the text/word/line arrays — no shuffle, no UDF; thresholds are the
    * published ones. Returned in (name, column) pairs so callers can
    * report per-rule rejection rates as well as filter.
    */
  def gopherRules(text: Column): Seq[(String, Column)] = {
    val ws = tokens(text)
    val n = size(ws)
    val nd = n.cast("double")
    val meanLen = aggregate(ws, lit(0L), (a, w) => a + length(w)).cast("double") / nd
    // symbol-to-word ratio counts '#' and ellipses ('...' or '…')
    val symbols = (length(text) - length(replace(text, lit("#"), lit("")))) +
      (length(text) - length(replace(text, lit("..."), lit("")))) / lit(3) +
      (length(text) - length(replace(text, lit("…"), lit(""))))
    val lines = split(text, "\n")
    val nLines = size(lines).cast("double")
    val bulletLines = size(filter(lines, l => ltrim(l).rlike("^[-*•]")))
    val ellipsisLines = size(filter(lines, l => rtrim(l).rlike("(\\.\\.\\.|…)$")))
    val alphaWords = size(filter(ws, w => w.rlike("[A-Za-z]")))
    val stopHits = size(array_intersect(
      transform(ws, w => lower(w)),
      array(Seq("the", "be", "to", "of", "and", "that", "have", "with").map(lit): _*)))
    Seq(
      "n_words" -> n.cast("long"),
      "ok_word_count" -> (n >= 50 && n <= 100000),
      "ok_mean_word_len" -> (n > 0 && meanLen >= 3.0 && meanLen <= 10.0),
      "ok_symbol_ratio" -> (n > 0 && symbols.cast("double") / nd <= 0.1),
      "ok_bullet_lines" -> (bulletLines.cast("double") / nLines <= 0.9),
      "ok_ellipsis_lines" -> (ellipsisLines.cast("double") / nLines <= 0.3),
      "ok_alpha_words" -> (n > 0 && alphaWords.cast("double") / nd >= 0.8),
      "ok_stopwords" -> (stopHits >= 2))
  }

  /** Composite quality score in [0,1]: weighted blend of bounded signals
    * (deterministic; weights are arbitrary but fixed).
    */
  def qualityScore(text: Column): Column = {
    val m = qualityMetrics(text).toMap
    val lenScore = least(m("n_tokens").cast("double") / 100.0, lit(1.0))
    lit(0.3) * lenScore + lit(0.3) * m("type_token_ratio") +
      lit(0.2) * m("alpha_ratio") + lit(0.2) * least(m("stopword_ratio") * 5.0, lit(1.0))
  }
}
