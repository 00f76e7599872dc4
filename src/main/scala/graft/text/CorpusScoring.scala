package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term scoring: smoothed TF-IDF with the top-k terms per
  * document — the standard keyword/topic signal a curation pipeline
  * attaches before filtering or mixing.
  *
  * Scale shape: two aggregations that partition by (doc, term) and
  * (term) — both plain hash aggregations with map-side combine — and a
  * join of per-doc term counts against the (small) document-frequency
  * table, which AQE broadcasts when the vocabulary allows. Nothing is
  * quadratic and no per-doc state leaves the executors; the top-k is a
  * bounded window over each doc's own terms.
  *
  * Scores are rounded to 6 decimals BEFORE ranking so independent
  * engines (the DuckDB oracle) rank identically — ties then break by
  * term, deterministically. idf = ln((N+1)/(df+1)) + 1 (the classic
  * smooth variant, always positive).
  */
object CorpusScoring {

  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val n = docs.count()
    val toks = docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // tf already holds one row per (doc, term) — df is a re-aggregation
    // of that frame, not a second explode+distinct over the raw corpus
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("score", round(col("tf") * (log(lit(n + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rank"))
  }
}
