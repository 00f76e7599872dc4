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
  /** BM25 relevance of every document to a fixed query-term set — the
    * retrieval scorer (Robertson/Spärck Jones) a curation pipeline uses
    * to mine topic-targeted subsets ("pull the science-y slice of the
    * crawl") and the standard lexical side of RAG retrieval. Okapi form:
    * score(d) = Σ_t ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5)) ·
    * tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)). The population is
    * documents with ≥1 token (they define N and avgdl); only documents
    * matching ≥1 query term appear in the output.
    *
    * Scale shape: the query terms are a LITERAL in-filter, so the
    * occurrence explode keeps only matching tokens map-side (the tf
    * relation is O(matched docs × terms), not the corpus); doc lengths
    * are one hash aggregation of the same scan; df and the corpus stats
    * re-aggregate the tiny tf/length tables; idf and (N, avgdl) ride
    * broadcasts into one final join keyed by doc id. No corpus-sized
    * shuffle anywhere — the only big thing that moves is the pruned tf
    * relation.
    */
  def bm25Score(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) > 0)
    val dl = base.select(col(idCol), size(col("__ws")).cast("long").as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = dl.agg(count(lit(1)).as("__n"),
      (sum(col("dl")) * 1.0 / count(lit(1))).as("__avgdl"))
    val tf = base.select(col(idCol), explode(col("__ws")).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "t")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("__c",
        log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1.0) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl")))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        round(sum(col("__c")), 6).as("bm25"))
  }

  /** CCNet-shape perplexity bucketing: rank every document by its
    * [[lmBigramScore]] and cut the corpus into `buckets` equal NTILE
    * tiers (CCNet's head/middle/tail split — tier 3 of 3 is the most
    * corpus-typical text, tier 1 the boilerplate/garbage tail a pipeline
    * drops or down-samples). Ties in the 6-dp-rounded score break by
    * document id, so the assignment is a pure function of the corpus and
    * independent engines agree row-for-row.
    *
    * Scale shape: the ranking is [[graft.operators.GlobalRank.withNtile]]
    * — a range-repartitioned parallel sort with O(partitions) driver
    * offsets, NOT the single-reducer `NTILE() OVER (ORDER BY ...)` a
    * direct translation would run; the scored relation is persisted once
    * inside the rank (the LM pipeline is not recomputed per phase).
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 3, alpha: Double = 0.5): DataFrame = {
    // persisted: the rank's range partitioner SAMPLES its input before
    // the shuffle materializes it — without the cache the whole LM
    // pipeline would run twice (sampling pass + fill)
    val scored = lmBigramScore(docs, idCol, textCol, alpha)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.operators.GlobalRank
      .withNtile(scored, Seq(col("lm_score"), col(idCol)), buckets, "bucket")
      .select(col(idCol), col("lm_score"), col("bucket"))
  }

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
