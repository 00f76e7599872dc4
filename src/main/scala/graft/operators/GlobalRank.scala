package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global ranking: 1-based row numbers (and NTILE
  * buckets) under a total order, WITHOUT the single-reducer
  * `Window.orderBy` — the canonical 100-TB scale-killer, where one task
  * sorts the whole relation. Same two-phase shape as
  * [[graft.text.SequencePacking]]'s prefix sum: range-repartition on the
  * order columns (contiguous key ranges per partition, in partition-id
  * order), a PARALLEL per-partition window for local row numbers, then
  * one tiny count row per partition collects to the driver, becomes
  * exclusive-scan offsets, and broadcast-joins back. Driver-side data is
  * O(partitions); every task sorts only its own range.
  *
  * The order columns must form a TOTAL order (callers pass a unique
  * tiebreak) or the assignment is ambiguous by definition.
  */
object GlobalRank {

  /** Adds `outCol` = 1-based global row number under `order`. Returns the
    * augmented frame and the total row count (free — it is the last
    * offset, no extra pass). The returned frame carries a persisted
    * intermediate: the range partitioner SAMPLES its bounds, so without
    * the persist a second evaluation could re-sample and route rows to
    * different partitions than the offsets were collected from, silently
    * corrupting every rank. Blocks are reclaimed by the ContextCleaner
    * once the result is unreferenced.
    */
  def withRowNumber(df: DataFrame, order: Seq[Column], outCol: String,
      partitions: Int = 0): (DataFrame, Long) = {
    require(order.nonEmpty, "need at least one order column")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(p, order: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(order: _*)
    val local = parted.withColumn("__lrn", row_number().over(w).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one count row per partition — the only driver-side data
    val counts = local.groupBy("__pid").agg(max(col("__lrn")).as("__cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val total = if (counts.isEmpty) 0L else counts.map(_._2).sum
    val offsetDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    val ranked = local.join(broadcast(offsetDf), "__pid")
      .withColumn(outCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
    (ranked, total)
  }

  /** Adds `outCol` = NTILE(`buckets`) under `order` — standard SQL
    * semantics: with n rows, the first n % buckets buckets hold
    * ceil(n/buckets) rows, the rest floor(n/buckets). Exact (no sketch),
    * yet never funnels the relation through one task: the bucket is a
    * closed-form expression over the distributed global row number and
    * two driver constants derived from the total count.
    */
  def withNtile(df: DataFrame, order: Seq[Column], buckets: Int,
      outCol: String, partitions: Int = 0): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val (ranked, n) = withRowNumber(df, order, "__rn", partitions)
    val q = n / buckets
    val rem = n % buckets
    val cut = rem * (q + 1) // rows 1..cut live in the ceil-sized buckets
    val bucket =
      if (q == 0) col("__rn") // n < buckets: row r is bucket r
      else when(col("__rn") <= cut, floor((col("__rn") - 1) / (q + 1)) + 1)
        .otherwise(lit(rem) + floor((col("__rn") - 1 - cut) / q) + 1)
    ranked.withColumn(outCol, bucket.cast("long")).drop("__rn")
  }
}
