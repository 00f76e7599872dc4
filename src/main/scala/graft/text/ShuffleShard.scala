package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic global corpus shuffle + sharding — the last stage of a
  * training-data pipeline: training wants documents in a fixed
  * pseudo-random order, cut into equal shards for data-loader
  * parallelism, and REPRODUCIBLE (the same corpus must shard
  * identically on every run, so a resumed/repeated job trains on the
  * same stream).
  *
  * The shuffle order is the multiplicative-hash order
  * [[MixtureSampling.orderHash]] already uses (id · prime mod 1e9+7,
  * id tiebreak) — a pure function of the id, no RNG state — and the
  * rank/shard assignment is [[graft.operators.GlobalRank]]: a
  * range-repartitioned parallel sort with O(partitions) driver offsets,
  * never a single-reducer `ORDER BY`. At 100 TB this is exactly the
  * "global shuffle" a naive `ORDER BY rand()` cannot do: the hash
  * order costs one range shuffle, the assignment is exact, and the
  * oracle can replay every row.
  */
object ShuffleShard {

  /** Adds `position` (1-based rank in the shuffled order) and `shard`
    * (1-based NTILE over `shards` — contiguous runs of the shuffled
    * order, sizes differing by at most one).
    */
  def shuffleShards(docs: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, "need a positive shard count")
    val h = MixtureSampling.orderHash(col(idCol))
    val (ranked, n) = graft.operators.GlobalRank.withRowNumber(
      docs, Seq(h, col(idCol)), "position")
    // same closed-form NTILE as GlobalRank.withNtile, reusing the rank
    // we already have (one range shuffle total, not two)
    val q = n / shards
    val rem = n % shards
    val cut = rem * (q + 1)
    val bucket =
      if (q == 0) col("position")
      else when(col("position") <= cut, floor((col("position") - 1) / (q + 1)) + 1)
        .otherwise(lit(rem) + floor((col("position") - 1 - cut) / q) + 1)
    ranked.withColumn("shard", bucket.cast("long"))
  }

  /** Materialize the shuffled shards: one directory per shard, rows in
    * shuffled order within each shard file (data loaders stream them
    * sequentially). The shard column drives a directory-partitioned
    * write; `position` rides along so a reader can verify/restore the
    * order.
    */
  def writeShards(docs: DataFrame, idCol: String, shards: Int, outDir: String): Unit =
    shuffleShards(docs, idCol, shards)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("position"))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
}
