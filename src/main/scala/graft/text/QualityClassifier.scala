package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-corpus quality classifier — the fastText-shaped linear
  * filter every large pretraining pipeline runs (GPT-3 §2.2 / CCNet /
  * FineWeb style): train a model to separate a curated reference set
  * from the rest of the crawl, then score EVERY document by its
  * log-odds of reference membership; downstream stages threshold or
  * importance-sample on the score. The model here is multinomial Naive
  * Bayes with add-1 smoothing over whitespace tokens — like fastText, a
  * LINEAR model over token counts, so training is nothing but counting:
  * two hash aggregations, no gradient loop, and the learned weights are
  * exactly replayable by an independent SQL engine (the DuckDB oracle
  * reproduces every weight and score bit-for-bit up to 6-dp rounding).
  *
  * score(doc) = ln((nPos+1)/(nNeg+1))
  *            + Σ over token OCCURRENCES w of
  *                ln((c(w,pos)+1)/(totPos+V)) − ln((c(w,neg)+1)/(totNeg+V))
  * where nPos/nNeg count population documents per class, c(w,cls) counts
  * occurrences of w in class cls, totPos/totNeg the per-class occurrence
  * totals, and V the vocabulary size (distinct tokens). Documents with
  * no tokens carry no evidence and are excluded (they neither train nor
  * score — the population is "documents with at least one token").
  *
  * Scale shape: ONE corpus scan explodes occurrences; the class-count
  * model is one hash aggregation of those occurrences (map-side
  * combined), priors and totals are re-aggregations of tiny frames
  * (1-row broadcasts), and scoring joins occurrences back against the
  * Zipf-bounded model through [[graft.operators.SkewJoin.hotSplit]] —
  * "the"'s billion occurrences resolve map-side against a broadcast
  * head, only tail tokens shuffle. Same skew structure as
  * [[CorpusScoring.lmBigramScore]]'s scoring join.
  */
object QualityClassifier {

  /** Per-document reference-membership score: (idCol, n_tokens,
    * log_odds, predicted). `positive` is the weak-label predicate that
    * defines the reference class (production: membership in a curated
    * corpus; the driver row uses `lang = 'en'` as the stand-in
    * reference set). `predicted` = 1 iff the ROUNDED log-odds is
    * positive — both engines compare the same 6-dp value, so a
    * 1e-15 summation-order wobble at the boundary cannot flip the
    * label in one engine only.
    */
  def naiveBayesScore(docs: DataFrame, idCol: String, textCol: String,
      positive: Column): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol),
        when(positive, 1).otherwise(0).as("__y"))
    val pop = base.filter(size(TextFunctions.tokens(col(textCol))) > 0)
    val occ = pop.select(col(idCol), col("__y"),
      explode(TextFunctions.tokens(col(textCol))).as("w"))
    // priors: one row, broadcast
    val pri = pop.agg(sum(col("__y")).as("npos"),
      sum(lit(1) - col("__y")).as("nneg"))
    // the model: per-token class counts — Zipf-bounded vocabulary
    val cw = occ.groupBy("w").agg(sum(col("__y")).as("cpos"),
      sum(lit(1) - col("__y")).as("cneg"))
    val tot = cw.agg(sum(col("cpos")).as("tp"), sum(col("cneg")).as("tn"),
      count(lit(1)).as("v"))
    val model = cw.crossJoin(broadcast(tot))
      .select(col("w"),
        (log((col("cpos") + 1.0) / (col("tp") + col("v"))) -
          log((col("cneg") + 1.0) / (col("tn") + col("v")))).as("llr"),
        (col("cpos") + col("cneg")).as("__occ"))
    graft.operators.SkewJoin.hotSplit(occ, model, "w", hotBy = col("__occ"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"), sum(col("llr")).as("__s"))
      .crossJoin(broadcast(pri))
      .withColumn("log_odds",
        round(log((col("npos") + 1.0) / (col("nneg") + 1.0)) + col("__s"), 6))
      .withColumn("predicted",
        when(col("log_odds") > 0, 1L).otherwise(0L))
      .select(col(idCol), col("n_tokens"), col("log_odds"), col("predicted"))
  }
}
