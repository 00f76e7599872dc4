package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Leakage-safe train/validation/test splitting.
  *
  * Hashing documents independently into splits leaks evaluation data
  * whenever near-duplicates exist: a test document's near-copy lands in
  * train with probability trainPct, and the benchmark measures
  * memorization instead of generalization. The correct unit of
  * assignment is the NEAR-DUP CLUSTER (the same closure
  * [[graft.dedup.Dedup.neardupDedup]] deduplicates by): every member of
  * a cluster hashes to the same split, so no near-dup pair can ever
  * cross the train/eval boundary.
  *
  * Scale shape: the cluster labels come from the linear star-edge
  * candidate pipeline + components (no all-pairs step), and the split
  * assignment itself is one deterministic arithmetic hash per row — the
  * repo-standard Knuth multiplicative hash, exactly replayable in plain
  * SQL (no engine-specific hash function), so the whole split is
  * reproducible run-to-run and auditable by the oracle.
  */
object DatasetSplit {

  /** docs + (cluster_id, split) columns; split is 'train' for bucket <
    * trainPct, 'validation' for the next valPct buckets, else 'test'
    * (buckets 0..99 from the cluster id's multiplicative hash).
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2, threshold: Double = 0.5,
      trainPct: Int = 80, valPct: Int = 10,
      driverLimit: Long = Dedup.DriverGraphLimit): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val (pairs, cached) = Dedup.minhashLshEdgesCached(docs, idCol, textCol, n, threshold)
    val comp = Dedup.components(pairs, "id_a", "id_b", driverLimit = driverLimit)
      .withColumnRenamed("id", idCol).withColumnRenamed("component", "__comp")
    cached.foreach(_.unpersist())
    val bucket = pmod(
      col("cluster_id") * lit(2654435761L) % lit(1000000007L), lit(100L))
    docs.join(comp, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("__comp"), col(idCol)))
      .drop("__comp")
      .withColumn("split",
        when(bucket < trainPct, lit("train"))
          .when(bucket < trainPct + valPct, lit("validation"))
          .otherwise(lit("test")))
  }
}
