package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import graft.core.{GraftField, GraftSchema}
import graft.query.GraftQuery
import graft.table.GraftTable

/** A PERSISTED MinHash-LSH near-dup index served by the engine itself —
  * the "dedup new data against a 100-TB corpus" shape (the SearchIndex
  * playbook applied to near-duplication): band buckets live as a graft
  * table keyed by (band, bucket hash), corpus texts as a second table
  * keyed by doc id, and finding a batch's near-dups costs
  *
  *   1. one map pass over the batch (shingles → signature → bands),
  *   2. O(batch × bands) POINT LOOKUPS into the bucket table (region-
  *      pruned key reads — never a corpus scan or a corpus-wide join),
  *   3. point-fetch of the candidate docs' texts, and
  *   4. exact-Jaccard verification against only those candidates.
  *
  * `append` grows both tables through the normal LSM ingest, so the
  * index absorbs a continuous crawl without rebuilds (compaction
  * maintains the leaves like any other table). The two driver-side
  * `collect`s are serving-tier bounded: distinct (band, bucket) keys
  * <= batch × bands, and candidate ids <= those buckets' occupancy —
  * both orders of magnitude below the corpus.
  *
  * Unlike [[Dedup.minhashLshPairs]] (the batch corpus×corpus form),
  * recall here never depends on bucket caps: every matching bucket is
  * point-read in full.
  */
object LshIndex {

  private val BandsSchema = GraftSchema(
    rowKeys = Seq(GraftField("band", IntegerType), GraftField("h", LongType)),
    sortKeys = Seq(GraftField("doc_id", LongType)),
    values = Nil)

  private val DocsSchema = GraftSchema(
    rowKeys = Seq(GraftField("doc_id", LongType)),
    sortKeys = Nil,
    // last-write-wins: re-appending a doc_id UPSERTS its text, so the
    // exact-Jaccard verify always runs against the current content
    values = Seq(GraftField("text", StringType, nullable = false)))

  final case class Config(n: Int, numHashes: Int, bands: Int) {
    def rows: Int = numHashes / bands
  }

  private def configPath(dir: String) = s"$dir/lsh-config.json"

  private def writeConfig(dir: String, cfg: Config): Unit =
    graft.meta.GraftFS.writeString(configPath(dir),
      s"""{"n":${cfg.n},"numHashes":${cfg.numHashes},"bands":${cfg.bands}}""")

  def readConfig(dir: String): Config = {
    val s = graft.meta.GraftFS.readString(configPath(dir))
    def f(k: String): Int = s"""\"$k\":(\\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    Config(f("n"), f("numHashes"), f("bands"))
  }

  /** (band, h, doc_id) bucket rows of a document set under cfg. */
  private def bucketRows(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config): DataFrame = {
    import graft.functions.HashExpressions._
    docs.select(col(idCol).as("doc_id"),
        word_shingle_set(col(textCol), cfg.n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        posexplode(band_hashes(minhash_signature(col("sh"), cfg.numHashes),
          cfg.bands, cfg.rows)).as(Seq("band", "h")))
      .select(col("band").cast("int").as("band"), col("h"), col("doc_id"))
  }

  /** Create the index tables and ingest the initial corpus. */
  def build(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      dir: String, n: Int = 2, numHashes: Int = 128, bands: Int = 64): Unit = {
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val cfg = Config(n, numHashes, bands)
    // 4 leaves on the leading band key — enough structure for pruned
    // lookups at test scale; production sizes splits to the corpus
    GraftTable.create(spark, s"$dir/bands", BandsSchema,
      splitPoints = Seq(16, 32, 48))
    GraftTable.create(spark, s"$dir/docs", DocsSchema,
      config = graft.table.TableConfig(aggregationConfig = "last(text)"))
    writeConfig(dir, cfg)
    append(spark, dir, docs, idCol, textCol)
  }

  /** Incremental growth: normal LSM ingest into both tables. */
  def append(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String): Unit = {
    val cfg = readConfig(dir)
    GraftTable.load(spark, s"$dir/bands")
      .ingest(bucketRows(docs, idCol, textCol, cfg))
    GraftTable.load(spark, s"$dir/docs")
      .ingest(docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
        .filter(col("text").isNotNull))
  }

  /** DELETE documents from the index: one row-key tombstone write on
    * the docs table — O(deleted ids), no band rewrite. Correctness is
    * immediate: [[findNearDups]] verifies candidates against the
    * point-fetched CURRENT texts, and a tombstoned doc_id fetches
    * nothing, so stale band rows can only cost a wasted candidate
    * lookup, never a stale match. Upsert needs no separate call —
    * [[append]] on an existing doc_id last-write-wins the text and adds
    * the new content's buckets. Reclaim dead band rows with
    * [[vacuumBands]] when the stale fraction warrants.
    */
  def delete(spark: SparkSession, dir: String, ids: DataFrame, idCol: String): Unit = {
    GraftTable.load(spark, s"$dir/docs")
      .deleteKeys(ids.select(col(idCol).cast("long").as("doc_id")))
    ()
  }

  /** Physically drop band rows whose doc is deleted or whose buckets
    * belong to an overwritten text — rewrite the bands table from the
    * CURRENT docs (an O(corpus) maintenance pass, the index-level
    * analog of [[graft.vectors.VectorFunctions.vacuumIndex]]; run it
    * when the stale-candidate fraction grows, not per delete).
    */
  def vacuumBands(spark: SparkSession, dir: String): Unit = {
    val cfg = readConfig(dir)
    val docs = GraftTable.load(spark, s"$dir/docs").toDF
    GraftTable.load(spark, s"$dir/bands")
      .overwrite(bucketRows(docs, "doc_id", "text", cfg))
  }

  /** Near-dups of `batch` against the indexed corpus: (qid, doc_id,
    * jaccard) with exact jaccard >= threshold, candidates drawn ONLY
    * from the batch's band buckets via point lookups.
    */
  def findNearDups(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double): DataFrame = {
    import graft.functions.HashExpressions._
    val cfg = readConfig(dir)
    val q = batch.select(col(idCol).as("qid"),
        word_shingle_set(col(textCol), cfg.n).as("qsh"))
      .filter(size(col("qsh")) > 0)
    val qb = q.select(col("qid"), col("qsh"),
        posexplode(band_hashes(minhash_signature(col("qsh"), cfg.numHashes),
          cfg.bands, cfg.rows)).as(Seq("band", "h")))
      .select(col("qid"), col("qsh"), col("band").cast("int").as("band"), col("h"))
      .persist()
    try {
      // bounded: <= batch x bands distinct bucket keys
      val keys = qb.select("band", "h").distinct().collect()
        .map(r => Seq(r.getInt(0), r.getLong(1)): Seq[Any])
      if (keys.isEmpty) return spark.emptyDataFrame
        .withColumn("qid", lit(0L)).withColumn("doc_id", lit(0L))
        .withColumn("jaccard", lit(0.0)).limit(0)
      val bandsTable = GraftTable.load(spark, s"$dir/bands")
      val cand = bandsTable
        .query(GraftQuery.forKeys(BandsSchema, keys: _*))
        .join(broadcast(qb.select("qid", "band", "h")), Seq("band", "h"))
        .select("qid", "doc_id").distinct()
      // bounded: <= matched buckets' occupancy
      val candIds = cand.select("doc_id").distinct().collect()
        .map(r => Seq(r.getLong(0)): Seq[Any])
      if (candIds.isEmpty) return cand.withColumn("jaccard", lit(0.0)).limit(0)
      val ctext = GraftTable.load(spark, s"$dir/docs")
        .query(GraftQuery.forKeys(DocsSchema, candIds: _*))
      val csets = ctext.select(col("doc_id"),
        word_shingle_set(col("text"), cfg.n).as("csh"))
      cand
        .join(csets, "doc_id")
        .join(broadcast(q), "qid")
        .select(col("qid"), col("doc_id"),
          (size(array_intersect(col("qsh"), col("csh"))).cast("double") /
            size(array_union(col("qsh"), col("csh"))).cast("double")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    } finally {
      qb.unpersist()
      ()
    }
  }
}
