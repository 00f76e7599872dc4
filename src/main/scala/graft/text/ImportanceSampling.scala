package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every raw document by how much more likely its
  * hashed-n-gram features are under a TARGET corpus distribution than
  * under the RAW corpus distribution, then keep the top-k. This is the
  * published scalable recipe for "pull the Wikipedia-like / domain-like
  * slice out of a 100-TB crawl": the feature space is a fixed bucket
  * count (hash collisions are part of the estimator, not a bug), so
  * both bag-of-ngrams models are tiny regardless of corpus size.
  *
  * Reference scope note: the reference engine (sleeper) has no corpus
  * selection; this is part of the training-data-pipeline superset
  * (SURVEY §2 LLM-pipeline addendum).
  *
  * Scale shape: gram→bucket is one codegen expression
  * ([[graft.functions.HashOps.gramBuckets]]) — no string intermediates;
  * the two unigram/bigram bag models are ONE shared hash aggregation of
  * the bucket occurrences (target counts ride a conditional sum, so the
  * target subset is not a second scan); the per-bucket log-ratio table
  * is at most `buckets` rows and broadcasts into the scoring pass; the
  * only corpus-sized shuffle is the per-document partial-aggregated
  * groupBy. Selection is [[graft.operators.GlobalRank]] — a
  * range-partitioned parallel rank, never a single-reducer
  * `Window.orderBy`. The corpus is scanned twice (model build +
  * scoring), the same trade [[CorpusScoring.lmBigramScore]] documents:
  * persisting the exploded occurrences costs more than a re-scan.
  *
  * Determinism: weights are log-ratios of integer counts with +1 /
  * +buckets smoothing, rounded to 6 dp before ranking, and the rank
  * tiebreaks on document id — so the selected set is a pure function of
  * the corpus and the DuckDB oracle replays it row-for-row.
  */
object ImportanceSampling {

  /** Per-document DSIR importance weight: sum over word-n-gram feature
    * occurrences of `ln p̂_target(bucket) − ln p̂_raw(bucket)`, both
    * models add-one smoothed over `buckets` cells. Documents with fewer
    * than `n` words carry no features and drop out (no weight is
    * defined for them). Output: (idCol, n_grams, log_ratio).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 4096, n: Int = 2): DataFrame = {
    require(buckets > 0, "need a positive feature-bucket count")
    import graft.functions.HashExpressions.gram_buckets
    val spark = docs.sparkSession
    import spark.implicits._
    val occ = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), coalesce(targetPred.cast("long"), lit(0L)).as("__y"),
        explode(gram_buckets(col(textCol), n, buckets)).as("__bkt"))
    // one aggregation builds BOTH models: target counts are the
    // conditional sum, raw counts the plain count. The aggregated
    // table is ≤ `buckets` rows, so it lands on the driver (bounded by
    // construction) and the log-ratio model becomes a literal broadcast
    // relation — the corpus is scanned exactly twice (model build +
    // scoring), with no third lineage replay for the totals.
    val counts = occ.groupBy("__bkt")
      .agg(sum(col("__y")).as("__ct"), count(lit(1)).as("__cr"))
      .as[(Int, Long, Long)].collect()
    val tt = counts.map(_._2).sum
    val tr = counts.map(_._3).sum
    val model = counts.toSeq.map { case (bkt, ct, cr) =>
      (bkt, math.log((ct + 1.0) / (tt.toDouble + buckets)) -
        math.log((cr + 1.0) / (tr.toDouble + buckets)))
    }.toDF("__bkt", "__r")
    occ.join(broadcast(model), "__bkt")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_grams"),
        round(sum(col("__r")), 6).as("log_ratio"))
  }

  /** Top-`k` raw documents by DSIR weight (the deterministic top-k
    * variant of the paper's Gumbel resampling — reproducibility over
    * sampling noise). Adds a 1-based `rank`; rows with rank > k are
    * dropped.
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, k: Int, buckets: Int = 4096, n: Int = 2): DataFrame = {
    require(k > 0, "need a positive selection size")
    val w = dsirWeights(docs, idCol, textCol, targetPred, buckets, n)
    val (ranked, _) = graft.operators.GlobalRank.withRowNumber(
      w, Seq(col("log_ratio").desc, col(idCol)), "rank")
    ranked.filter(col("rank") <= k)
      .select(col(idCol), col("n_grams"), col("log_ratio"), col("rank"))
  }
}
