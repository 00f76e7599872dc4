package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

/** Corpus deduplication operators for training-data pipelines: exact,
  * exact n-gram Jaccard, MinHash+LSH, and SimHash. All are shuffle-lean
  * by construction:
  *  - exact dedup groups on (hash, key) so the shuffle carries a long,
  *    not the document text;
  *  - MinHash/LSH shuffles only (band hash, doc id) pairs — candidate
  *    generation never moves document bodies;
  *  - candidate verification joins the shingle sets back in only for the
  *    (tiny) candidate set.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per distinct text. Two-phase:
    * group by xxhash64(text) first (cheap shuffle), verify text equality
    * inside each hash group to be collision-safe.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), col(textCol), xxhash64(col(textCol)).as("__h"))
      .groupBy(col("__h"), col(textCol))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col(textCol))

  /** All pairs (a < b) with exact word-n-gram Jaccard >= threshold,
    * via an inverted shingle index (join on shingle, count intersections,
    * derive union from set sizes). Exact but O(sum of postings^2) in the
    * worst case — the scale path is `minhashLsh` below.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), explode(shingleSet(col(textCol), n)).as("shingle"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash + LSH near-dup pairs: signature -> band buckets -> candidate
    * pairs -> exact-Jaccard verification. With numHashes=128 and
    * bands=64 (r=2), recall at jaccard>=0.5 is 1 - (1-0.25)^64 ~ 1-1e-8.
    * Only (band hash, id) pairs shuffle; verification joins shingle sets
    * for candidates only.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, numHashes: Int = 128, bands: Int = 64): DataFrame = {
    val rows = numHashes / bands
    val withSets = docs.select(col(idCol).as("id"), shingleSet(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sigs = withSets.select(col("id"),
      bandHashes(minhashSignature(col("sh"), numHashes), bands, rows).as("bh"))
    val buckets = sigs.select(col("id"), posexplode(col("bh")).as(Seq("band", "h")))
    val candidates = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(withSets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(withSets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, using
    * the band trick: split the 64-bit fingerprint into `maxHamming + 1`
    * segments — any pair within the distance must agree exactly on at
    * least one segment (pigeonhole), so candidates come from cheap
    * equality joins on segments.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val nSeg = maxHamming + 1
    val segBits = 64 / nSeg
    val fp = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("fp"))
    val segs = fp.select(col("id"), col("fp"),
      posexplode(transform(sequence(lit(0), lit(nSeg - 1)),
        s => call_function("shiftrightunsigned", col("fp"), s * segBits)
          .bitwiseAND(lit((1L << segBits) - 1)))).as(Seq("seg", "v")))
    segs.as("a").join(segs.as("b"),
        col("a.seg") === col("b.seg") && col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.fp"), col("b.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
