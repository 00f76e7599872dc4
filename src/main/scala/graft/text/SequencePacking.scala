package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget bins (training sequences) by greedy CONTIGUOUS
  * packing in id order — bin = floor(tokens-before-this-doc / budget).
  * Deterministic (a pure function of the corpus), so shards are
  * reproducible across runs and engines; oversize documents overflow
  * their bin rather than splitting (the usual packing contract).
  *
  * The global running sum is computed as a DISTRIBUTED prefix sum — the
  * naive `Window.orderBy(id)` with no partitioning funnels the corpus
  * through one task and is the canonical 100-TB scale-killer. Instead:
  * range-repartition by id (contiguous id ranges per partition, in
  * partition order), a PARALLEL per-partition window for local prefix
  * sums, then per-partition totals (one tiny row each) collect to the
  * driver, turn into starting offsets, and broadcast-join back — the
  * classic two-phase scan, O(rows/partitions) per task.
  */
object SequencePacking {

  /** Per-document bin assignment: (idCol, ntok, bin). `tokenCount`
    * prices a document in tokens — default whitespace tokens; training
    * pipelines budgeting real tokenizer output pass
    * `graft.functions.BpeExpressions.bpe_token_count(_, merges)`.
    */
  def packContiguous(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long, partitions: Int = 0,
      tokenCount: Column => Column = c => size(TextFunctions.tokens(c))): DataFrame =
    packImpl(docs, idCol, textCol, budgetTokens, partitions, tokenCount)._1

  /** [[packContiguous]] that MATERIALIZES the assignment (localCheckpoint)
    * and unpersists its cached intermediate before returning — for
    * callers packing many corpora in one session, where relying on the
    * ContextCleaner to reclaim each call's cached blocks is unpredictable
    * under memory pressure. The returned frame is computed and detached
    * from the packing lineage.
    */
  def packContiguousEager(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long, partitions: Int = 0,
      tokenCount: Column => Column = c => size(TextFunctions.tokens(c))): DataFrame = {
    val (result, cached) = packImpl(docs, idCol, textCol, budgetTokens, partitions, tokenCount)
    try result.localCheckpoint(true)
    finally cached.unpersist()
  }

  private def packImpl(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long, partitions: Int,
      tokenCount: Column => Column): (DataFrame, DataFrame) = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = docs.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val toks = docs.select(col(idCol),
      tokenCount(col(textCol)).cast("long").as("ntok"))
    val parted = toks.repartitionByRange(p, col(idCol))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Persisted: the frame is evaluated twice (totals collect below, then
    // the caller's action on the join), and WITHOUT a persist the range
    // partitioner re-samples on the second run — against an upstream with
    // nondeterministic row order (a shuffle/join output, a task retry)
    // rows could land in different __pid's than the totals were collected
    // from, silently corrupting every bin. The cache also halves the
    // tokenize+shuffle+window cost; blocks are reclaimed by the
    // ContextCleaner once the result frame is unreferenced (or
    // deterministically by [[packContiguousEager]]).
    val local = parted.withColumn("__lsum", sum(col("ntok")).over(w)).persist()
    // one row per partition — the only driver-side data, O(partitions)
    val totals = local.groupBy("__pid").agg(max(col("__lsum")).as("__total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // offset(pid) = Σ totals of all partitions before pid (exclusive scan);
    // range partitioning orders partition ids by id range, so this is the
    // global token count preceding the partition
    val cum = totals.map(_._2).scanLeft(0L)(_ + _)
    val offsetRows = totals.map(_._1).zip(cum)
    val offsetDf = spark.createDataFrame(offsetRows.toSeq).toDF("__pid", "__offset")
    val result = local.join(broadcast(offsetDf), "__pid")
      .withColumn("bin",
        floor((col("__offset") + col("__lsum") - col("ntok")) / budgetTokens).cast("long"))
      .select(col(idCol), col("ntok"), col("bin"))
    (result, local)
  }

  /** Bin-level summary: (bin, docs, tokens), the shard manifest. */
  def packSummary(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long,
      tokenCount: Column => Column = c => size(TextFunctions.tokens(c))): DataFrame =
    packContiguous(docs, idCol, textCol, budgetTokens, tokenCount = tokenCount)
      .groupBy("bin")
      .agg(count(lit(1)).as("docs"), sum(col("ntok")).as("tokens"))
}
