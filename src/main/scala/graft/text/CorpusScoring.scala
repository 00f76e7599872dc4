package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term scoring: smoothed TF-IDF with the top-k terms per
  * document — the standard keyword/topic signal a curation pipeline
  * attaches before filtering or mixing.
  *
  * Scale shape: the raw corpus is scanned ONCE into the (doc, term, tf)
  * aggregate, which is persisted and reused three ways — the
  * document-frequency re-aggregation, the corpus-size N (a 1-row
  * broadcast, so no separate `docs.count()` pass over the corpus), and
  * the scoring join itself. Both aggregations are plain hash aggs with
  * map-side combine; the df table broadcasts when the vocabulary
  * allows; the top-k is a bounded window over each doc's own terms.
  * The persisted tf blocks are reclaimed by the ContextCleaner once the
  * result frame is unreferenced (spill-safe: MEMORY_AND_DISK).
  *
  * Scores are rounded to 6 decimals BEFORE ranking so independent
  * engines (the DuckDB oracle) rank identically — ties then break by
  * term, deterministically. idf = ln((N+1)/(df+1)) + 1 (the classic
  * smooth variant, always positive), where N counts documents with at
  * least one term (an empty document neither holds terms nor dilutes
  * them).
  */
object CorpusScoring {

  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // df and N both re-aggregate the cached tf frame, never the corpus
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDf = tf.select(countDistinct(col(idCol)).as("__n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(nDf))
      .withColumn("score",
        round(col("tf") * (log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rank"))
  }

  /** Corpus-internal duplicated-span detection — the exact-substring-
    * dedup signal (Lee et al. '22 shape, span-granular): a word k-gram
    * occurring in ≥2 documents is boilerplate/duplication; each document
    * reports how much of it is made of such spans. Per doc:
    * (n_spans = distinct k-gram spans, n_dup_spans = spans shared with
    * another doc, dup_frac) — the filter signal pipelines threshold on.
    *
    * Scale shape: spans come from the one-pass codegen
    * `word_shingle_set` (per-doc distinct, so a span's count IS its
    * document frequency), the frequency table is one hash aggregation,
    * and the flag join carries (span, doc) pairs once. Spans join as
    * strings so an independent engine replays exactly; at 100 TB the
    * join key would be a 128-bit span fingerprint instead (collision
    * odds ~n²/2¹²⁸), halving shuffle bytes without changing the shape.
    * The exploded spans relation feeds the frequency aggregation AND
    * both branches of the flag join, so it is persisted — hotSplit's
    * own contract: one corpus scan materializes the spans, every later
    * pass reads the cached blocks (spill-safe MEMORY_AND_DISK; the
    * ContextCleaner reclaims them once the result is unreferenced).
    * The probe side is Zipf-skewed (boilerplate spans are exactly the
    * hot keys), so the flag join is
    * [[graft.operators.SkewJoin.hotSplit]]: the frequency table's head
    * broadcasts and resolves hot spans map-side, the tail takes the
    * shuffle — same structure as [[lmBigramScore]]'s scoring join.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4): DataFrame = {
    require(k >= 2, "a span needs at least 2 words")
    val spans = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(TextFunctions.shingleSet(col(textCol), k)).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freq = spans.groupBy("s").agg(count(lit(1)).as("d"))
    graft.operators.SkewJoin.hotSplit(spans, freq, "s", hotBy = col("d"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_spans"),
        sum(when(col("d") >= 2, 1L).otherwise(0L)).cast("long").as("n_dup_spans"))
      .withColumn("dup_frac", round(col("n_dup_spans") / col("n_spans"), 6))
  }

  /** Bigram language-model scoring — the CCNet-shape perplexity filter a
    * curation pipeline ranks documents with: train an add-α-smoothed
    * bigram LM on the corpus itself, score each document by its mean
    * bigram log-probability (higher = more corpus-typical; the tails are
    * boilerplate/garbage). `lm_score(d) = avg over bigram OCCURRENCES b
    * = (w1,w2) of ln((c(b)+α)/(c(w1·)+α·V))`, with c(w1·) the count of
    * bigrams starting w1 and V the model vocabulary — the distinct
    * words OF THE BIGRAM TABLE (first ∪ last words), so V folds out of
    * the tiny Zipf-bounded model instead of costing its own corpus
    * scan (a word occurring only in 1-word documents never enters a
    * bigram, so it rightly holds no smoothing mass). Documents with
    * fewer than two words carry no bigram and are excluded.
    *
    * Scale shape: bigram occurrences come from a one-pass codegen
    * expression (`word_ngrams`, no split-array intermediate); the count
    * model is one hash aggregation of those occurrences, the context
    * totals a re-aggregation of that (small, Zipf-bounded) table, and
    * scoring joins occurrences back against the model — broadcastable
    * for bounded vocabularies, a plain shuffled hash join otherwise.
    * The corpus is scanned twice (model build + scoring); persisting the
    * exploded occurrences would cost more than the second scan at scale.
    * SKEW at 100 TB: the probe side is Zipfian — "of the" would shuffle
    * a billion occurrences to one reducer in a naive shuffled join. The
    * model row for a hot bigram is ONE row, so the fix is structural,
    * not a salt: the scoring join is [[graft.operators.SkewJoin.hotSplit]]
    * — the model's head (small by definition) broadcasts and resolves
    * hot occurrences map-side; only tail keys, bounded per reducer by
    * construction, take the shuffle. The mean is rounded to 6 dp so
    * independent engines (the DuckDB oracle) agree despite
    * summation-order float drift.
    */
  def lmBigramScore(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "alpha must be positive (unseen bigrams need mass)")
    import graft.functions.HashExpressions.word_ngrams
    val bi = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(word_ngrams(col(textCol), 2)).as("b"))
    val bc = bi.groupBy("b").agg(count(lit(1)).as("c"))
    val cc = bc.groupBy(substring_index(col("b"), " ", 1).as("w1"))
      .agg(sum(col("c")).as("n"))
    // one combined model row per bigram: bc ⋈ cc joins count tables on
    // w1 (rows per w1 bounded by vocabulary — no occurrence skew here),
    // so the occurrence relation takes exactly ONE skew-managed join
    val model = bc.withColumn("w1", substring_index(col("b"), " ", 1))
      .join(cc, "w1")
      .select(col("b"), col("c"), col("n"))
    // vocabulary from the MODEL, not the corpus: distinct first ∪ last
    // words of the bigram table (Zipf-bounded — no extra corpus scan)
    val vDf = bc.select(substring_index(col("b"), " ", 1).as("w"))
      .union(bc.select(substring_index(col("b"), " ", -1).as("w")))
      .agg(countDistinct(col("w")).as("__v"))
    graft.operators.SkewJoin.hotSplit(bi, model, "b", hotBy = col("c"))
      .crossJoin(broadcast(vDf))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(avg(log((col("c") + alpha) / (col("n") + lit(alpha) * col("__v")))), 6)
          .as("lm_score"))
  }
}
