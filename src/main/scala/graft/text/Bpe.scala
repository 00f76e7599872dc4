package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{BpeMerges, BpeExpressions}
import BpeExpressions._

/** BPE training and the pinned corpus merge table.
  *
  * Training is the classic Sennrich '16 loop — tokenize, count adjacent
  * pairs, merge the most frequent, repeat — run DISTRIBUTED with the
  * right 100-TB shape: the raw corpus is scanned exactly once (word →
  * frequency aggregation); every training iteration then operates on
  * the deduplicated word histogram, which is Zipf-bounded (vocabulary
  * size, not corpus size). Per iteration: re-tokenize each distinct
  * word under the merges-so-far (codegen expression), explode adjacent
  * pairs weighted by word frequency, one hash-agg, take the max. Ties
  * break to the lexicographically smallest pair so training is
  * deterministic and engine-independent.
  */
object Bpe {

  /** The engine's pinned merge table: 48 merges trained by
    * [[trainMerges]] over the sf0.01 documents corpus (BpeSpec asserts
    * the trainer reproduces this table from that corpus). Pinned rather
    * than trained per-query so the DuckDB oracle can replay encoding
    * from the identical table, and so token budgets are stable across
    * corpus slices — the same reason production pipelines freeze their
    * tokenizer.
    */
  val corpusMerges: BpeMerges = BpeMerges(Vector(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"),
    ("s", "low"), ("c", "t"), ("ct", "or"), ("d", "er"),
    ("e", "ctor"), ("or", "der"), ("v", "ector")))

  /** The merge table as a SQL VALUES list `('a','b',rank), …` — the
    * oracle-side half of the shared table (single quotes doubled; the
    * corpus alphabet is [a-z] so this is belt-and-braces).
    */
  def mergesSqlValues(m: BpeMerges): String =
    m.pairs.zipWithIndex.map { case ((a, b), i) =>
      s"('${a.replace("'", "''")}','${b.replace("'", "''")}',$i)"
    }.mkString(", ")

  /** Shared DuckDB oracle CTE block replaying [[corpusMerges]] encoding:
    * per distinct word, a recursive CTE applies one lowest-rank/leftmost
    * merge per step (exactly the engine's spec — see BpeMerges scaladoc
    * for why that equals the classic batch encoder); the terminal state
    * is the minimum-length row, since every step shrinks the list by
    * one. `bpe_doc` then prices each document. Callers prepend
    * `WITH RECURSIVE` and append their own CTEs/SELECT.
    */
  def oracleCtes: String =
    s"""merges(a, b, r) AS (VALUES ${mergesSqlValues(corpusMerges)}),
       |bpe_words AS (
       |  SELECT DISTINCT unnest(string_split(text, ' ')) AS w
       |  FROM documents WHERE text IS NOT NULL
       |),
       |bpe_state AS (
       |  SELECT w, list_transform(range(1, length(w) + 1), i -> w[i:i]) AS toks
       |  FROM bpe_words WHERE w <> ''
       |  UNION ALL
       |  SELECT w, toks[1:bp-1] || [toks[bp] || toks[bp+1]] || toks[bp+2:] AS toks
       |  FROM (
       |    SELECT s.w, any_value(s.toks) AS toks, min_by(p.i, m.r * 1000 + p.i) AS bp
       |    FROM bpe_state s, unnest(range(1, len(s.toks))) AS p(i)
       |    JOIN merges m ON m.a = s.toks[p.i] AND m.b = s.toks[p.i + 1]
       |    GROUP BY s.w
       |  )
       |),
       |bpe_final AS (SELECT w, min(len(toks)) AS ntok FROM bpe_state GROUP BY w),
       |bpe_doc AS (
       |  SELECT d.doc_id,
       |         CAST(COALESCE(SUM(f.ntok), 0) AS BIGINT) AS bpe_tokens,
       |         CAST(COUNT(*) FILTER (WHERE d.w <> '') AS BIGINT) AS ws_tokens
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |        FROM documents WHERE text IS NOT NULL) d
       |  LEFT JOIN bpe_final f ON d.w = f.w
       |  GROUP BY d.doc_id
       |)""".stripMargin

  /** Train `nMerges` BPE merges over a text column. Returns the learned
    * table in rank order.
    */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): BpeMerges = {
    // the single corpus-wide scan: word histogram
    val words = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .persist()
    try {
      var merges = Vector.empty[(String, String)]
      var done = false
      while (merges.size < nMerges && !done) {
        val m = BpeMerges(merges)
        val toks = words.select(col("f"), bpe_word_tokens(col("w"), m).as("t"))
          .filter(size(col("t")) > 1)
        // adjacent (a,b) pairs; transform/element_at are CodegenFallback
        // but run over the distinct-word histogram, never the corpus
        val top = toks.select(col("f"), explode(transform(
            sequence(lit(0), size(col("t")) - 2),
            i => struct(element_at(col("t"), i + 1).as("a"),
              element_at(col("t"), i + 2).as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("f")).as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1)
          .collect()
        if (top.isEmpty) done = true
        else merges = merges :+ ((top(0).getString(0), top(0).getString(1)))
      }
      BpeMerges(merges)
    } finally words.unpersist()
  }
}
