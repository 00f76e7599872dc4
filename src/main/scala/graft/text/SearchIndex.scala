package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import graft.core.{GraftField, GraftSchema}
import graft.meta.GraftFS
import graft.table.GraftTable

/** Persisted inverted index served by the engine's own table machinery —
  * the 100-TB form of lexical search: [[CorpusScoring.bm25Score]] rescans
  * the corpus per query; here the corpus is scanned ONCE into a postings
  * GraftTable (row key = term, sort key = doc id, values = tf and doc
  * length), and every query is a handful of key point-lookups through
  * the engine's sorted-parquet layout — page-pruned reads of exactly the
  * matching postings lists, never a corpus scan.
  *
  * Design notes for scale:
  *  - postings rows are (term, doc_id, tf, dl): doc length is
  *    denormalized into the posting (classic search-engine layout) so
  *    scoring needs no second lookup;
  *  - df(term) is NOT stored — it is the length of the retrieved
  *    postings list, already in hand at serve time (kept exact under
  *    later appends for free);
  *  - corpus constants (N, avgdl) live in a one-line sidecar read O(1);
  *  - the index is a full GraftTable: splits, compaction, GC, time
  *    travel, and incremental ingest of new documents all apply to the
  *    postings like any other table (Zipf-hot terms are exactly the
  *    big-leaf case the split/salt machinery manages);
  *  - serving = point-lookup regions (one per query term) → df from the
  *    retrieved lists (a tiny aggregation) broadcast → per-doc Okapi
  *    sum → TakeOrdered top-k. Nothing corpus-sized moves.
  *
  * Tokenization, population (docs with ≥1 token), and the Okapi form
  * match [[CorpusScoring.bm25Score]] exactly, so index-served scores are
  * bit-equal to the direct scan (that equality is the driver row's
  * oracle).
  */
object SearchIndex {

  val indexSchema: GraftSchema = GraftSchema(
    rowKeys = Seq(GraftField("term", StringType)),
    sortKeys = Seq(GraftField("doc_id", LongType)),
    values = Seq(GraftField("tf", LongType), GraftField("dl", LongType)))

  private def statsPath(indexDir: String) = s"$indexDir/corpus-stats.json"
  private def pendingPath(indexDir: String) = s"$indexDir/corpus-stats.pending.json"
  private val AppendTxnApp = "search-index-append"

  private def jsonField(src: String, name: String): Long =
    src.split(s""""$name":""")(1).trim.takeWhile(c => c.isDigit || c == '-').toLong

  /** The pending-intent record, resolved against the ingest txn marker:
    * `Some((dn, dsumDl))` iff the paired ingest committed (fold the
    * delta in), `None` if it never did (discard the intent). A torn
    * intent file can only mean the ingest never started — the intent is
    * fully written before the ingest begins — so parse failures resolve
    * to None, never to a guess.
    */
  private def committedPending(table: GraftTable, indexDir: String): Option[(Long, Long)] =
    if (!GraftFS.exists(pendingPath(indexDir))) None
    else try {
      val p = GraftFS.readString(pendingPath(indexDir))
      val txn = jsonField(p, "txn")
      if (table.store.lastTxnVersion(AppendTxnApp).exists(_ >= txn))
        Some((jsonField(p, "n"), jsonField(p, "sum_dl")))
      else None
    } catch { case _: Exception => None }

  /** Fold any crash-abandoned intent into the durable stats (or discard
    * an uncommitted one), then clear it. Called at the top of every
    * append — so a crashed append's delta is settled before the next
    * intent overwrites the file — and after a successful ingest.
    */
  private def settlePending(table: GraftTable, indexDir: String): Unit = {
    committedPending(table, indexDir).foreach { case (dn, dsl) =>
      val s = GraftFS.readString(statsPath(indexDir))
      GraftFS.writeString(statsPath(indexDir),
        s"""{"n": ${jsonField(s, "n") + dn}, "sum_dl": ${jsonField(s, "sum_dl") + dsl}}""")
    }
    GraftFS.delete(pendingPath(indexDir))
  }

  /** One corpus scan → postings table + corpus-stats sidecar.
    * `splitPoints` pre-splits the term keyspace (pass sampled terms for
    * a large corpus; the sketch-median splitter takes over after).
    *
    * `maxDfFraction` < 1.0 elides terms occurring in more than that
    * fraction of documents (classic stopword elision): a partition tree
    * splits BETWEEN row-key values, so a Zipf-hot term's postings list
    * is an unsplittable hot leaf at corpus scale — and its BM25
    * contribution is ~0 by construction (idf = ln(1 + (N−df+0.5)/
    * (df+0.5)) → ln(1+~0.5/N)). The trade is documented, opt-in, and
    * exact: queries containing an elided term score as if the term
    * matched nothing.
    */
  def build(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
      splitPoints: Seq[String] = Nil, maxDfFraction: Double = 1.0): GraftTable = {
    val spark = docs.sparkSession
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) > 0)
      .select(col("doc_id"), size(col("__ws")).cast("long").as("dl"), col("__ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw = base
      .select(col("doc_id"), col("dl"), explode(col("__ws")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .select("term", "doc_id", "tf", "dl")
    val postings =
      if (maxDfFraction >= 1.0) raw
      else {
        val nDocs = base.count()
        val cap = (maxDfFraction * nDocs).toLong
        // df per term is a re-aggregation of the (already grouped)
        // postings; the hot terms being elided are exactly the few the
        // broadcast anti-join holds
        val hot = raw.groupBy("term").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > cap).select("term")
        raw.join(broadcast(hot), Seq("term"), "left_anti")
      }
    val table = GraftTable.create(spark, indexDir, indexSchema, splitPoints)
    table.ingest(postings)
    // corpus constants AFTER the ingest consumed `base` (shared persist)
    val Array(n, sumDl) = base.agg(count(lit(1)), sum(col("dl")))
      .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
    base.unpersist()
    GraftFS.writeString(statsPath(indexDir), s"""{"n": $n, "sum_dl": $sumDl}""")
    table
  }

  /** Incremental index maintenance: postings for NEW documents ingest
    * like any other table write (the LSM machinery merges them into the
    * term-sorted runs; compaction folds), and the corpus constants
    * accumulate in the sidecar. df needs no maintenance at all — it is
    * derived from the retrieved lists at serve time.
    *
    * Crash-safe stats protocol: the stats delta is written as an INTENT
    * (`corpus-stats.pending.json`, carrying a txn id) BEFORE the ingest,
    * the ingest commits under that txn id through the table's
    * exactly-once marker, and only then is the intent folded into
    * `corpus-stats.json`. A failure in any window leaves the sidecar
    * resolvable against the txn marker — [[corpusStats]] folds a
    * committed-but-unfinalized delta in at read time, and discards an
    * uncommitted one — so serve-time N/avgdl can never silently describe
    * a different corpus than the postings (the skew the naive
    * write-after-commit ordering allowed).
    */
  def append(docs: DataFrame, idCol: String, textCol: String, indexDir: String): Unit = {
    val spark = docs.sparkSession
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) > 0)
      .select(col("doc_id"), size(col("__ws")).cast("long").as("dl"), col("__ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = base
      .select(col("doc_id"), col("dl"), explode(col("__ws")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .select("term", "doc_id", "tf", "dl")
    val table = GraftTable.load(spark, indexDir)
    settlePending(table, indexDir) // a crashed append's delta, first
    val Array(n, sumDl) = base.agg(count(lit(1)), sum(col("dl")))
      .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
    val txn = table.store.lastTxnVersion(AppendTxnApp).getOrElse(0L) + 1
    GraftFS.writeString(pendingPath(indexDir),
      s"""{"txn": $txn, "n": $n, "sum_dl": $sumDl}""")
    table.ingest(postings, txn = Some((AppendTxnApp, txn)))
    base.unpersist()
    settlePending(table, indexDir)
  }

  /** Corpus constants: (N, avgdl) — durable stats plus any
    * committed-but-unfinalized append intent (see [[append]]), resolved
    * in memory so serving never writes.
    */
  def corpusStats(spark: SparkSession, indexDir: String): (Long, Double) = {
    val s = GraftFS.readString(statsPath(indexDir))
    var n = jsonField(s, "n")
    var sumDl = jsonField(s, "sum_dl")
    if (GraftFS.exists(pendingPath(indexDir))) {
      committedPending(GraftTable.load(spark, indexDir), indexDir).foreach {
        case (dn, dsl) => n += dn; sumDl += dsl
      }
    }
    (n, sumDl.toDouble / n)
  }

  /** Hybrid lexical+dense retrieval with reciprocal-rank fusion — the
    * standard RAG serving composition: BM25 top-`kEach` from the
    * postings index, cosine top-`kEach` from the vector side, fused as
    * RRF(d) = Σ_lists 1/(rrfK + rank_list(d)), final top-`k`.
    *
    * Both candidate lists are bounded (`kEach`) by construction, so the
    * fusion itself is a driver-side merge of ≤ 2·kEach rows — exactly
    * what a search head does; the heavy lifting (postings point-lookups,
    * distributed kNN) happened in the two retrievals. Ranks tiebreak on
    * doc id over the 6-dp BM25 / raw cosine orderings, and the fused
    * score rounds to 6 dp before the final cut, so the result is a pure
    * function of the corpus.
    */
  def hybridRrf(spark: SparkSession, indexDir: String, terms: Seq[String],
      vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      k: Int, kEach: Int = 50, rrfK: Int = 60): DataFrame = {
    import spark.implicits._
    val lex = searchBm25(spark, indexDir, terms, kEach)
      .select(col("doc_id"), col("bm25")).collect()
      .sortBy(r => (-r.getDouble(1), r.getLong(0)))
      .zipWithIndex.map { case (r, i) => r.getLong(0) -> (i + 1) }.toMap
    val den = graft.vectors.VectorFunctions
      .knnBrute(vectors, idCol, vecCol, query, queryVecCol, kEach)
      .collect() // already (sim desc, id) ordered by construction
      .zipWithIndex.map { case (r, i) => r.getLong(0) -> (i + 1) }.toMap
    val fused = (lex.keySet ++ den.keySet).toSeq.map { id =>
      val s = lex.get(id).map(r => 1.0 / (rrfK + r)).getOrElse(0.0) +
        den.get(id).map(r => 1.0 / (rrfK + r)).getOrElse(0.0)
      (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    fused.sortBy { case (id, s) => (-s, id) }.take(k)
      .toDF("doc_id", "rrf")
  }

  /** BM25 top-`k` for a query-term set, served from the index alone. */
  def searchBm25(spark: SparkSession, indexDir: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(k > 0, "need a positive k")
    val table = GraftTable.load(spark, indexDir)
    val (n, avgdl) = corpusStats(spark, indexDir)
    val postings = table.query(
      graft.query.GraftQuery.forKeys(table.schema, terms.distinct.map(Seq(_)): _*))
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    postings.join(broadcast(dfreq), "term")
      .withColumn("__c",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1.0) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        round(sum(col("__c")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
