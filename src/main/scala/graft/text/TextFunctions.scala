package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines, built
  * entirely from codegen'd Catalyst functions (no UDFs in the hot path):
  * tokenization, word n-gram shingles, MinHash signatures, language-ID
  * and quality heuristics.
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

  /** Word n-gram shingles as space-joined strings; empty array when the
    * document has fewer than n tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val ws = tokens(text)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct shingles (the set used for Jaccard). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** MinHash signature of a shingle set: k independent min-hashes,
    * h_i = min over shingles of xxhash64(shingle, i). Pure higher-order
    * expressions — computed in whole-stage codegen.
    */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => aggregate(shingleSet, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(s, seed))))

  /** LSH band hashes: signature split into `bands` bands of `rows`
    * values, each hashed; docs sharing any band hash become candidates.
    */
  def bandHashes(signature: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws("_", b, concat_ws(",", slice(signature, b * rows + 1, lit(rows))))))

  /** Exact Jaccard similarity of two string-array sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** SimHash (64-bit): per bit, sum +1/-1 weighted by each distinct
    * token's hash bit; bit set iff the sum is positive. Expressed as a
    * fold over tokens accumulating 64 counters packed in an array.
    */
  def simhash(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        transform(acc, (c, i) =>
          c + when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      })
    aggregate(
      transform(counts, (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"))

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
