package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import graft.meta.GraftFS
import graft.table.GraftTable

/** Continuous micro-batch ingest (T1): a Structured Streaming file
  * source over an inbox directory, batched into ingest jobs with the
  * reference's batcher knobs — minimum batch size and maximum file age
  * (reference: java/ingest/ingest-batcher-core/.../IngestBatcher.java,
  * docs/usage/ingest-batcher.md).
  *
  * Exactly-once: the stream's checkpoint (the file-source log) decides
  * which inbox files feed which micro-batch, and each micro-batch commits
  * through the state store's idempotent txn watermark
  * (StateStore.addFilesIfAbsent, with the batch id as the monotonically-
  * increasing version — Delta's `txn` model, O(#streams) state, not
  * O(#batches)). foreachBatch alone is only at-least-once — a crash after
  * the table commit but before the checkpoint commit replays the batch —
  * but the replay carries an already-committed version and skips.
  *
  * The txn app id is a STREAM UUID minted on first run and persisted in
  * the checkpoint directory — not the checkpoint path itself. A relocated
  * checkpoint keeps its identity (no double-ingest of replayed batches);
  * a deleted-and-recreated checkpoint mints a FRESH identity, so its
  * restarted batch ids (from 0) get a fresh watermark instead of being
  * silently swallowed by the old one. The checkpoint directory and the
  * stream's identity therefore live and die together, by construction.
  *
  * Each cycle is a `Trigger.AvailableNow` pass whose `foreachBatch`
  * hands the micro-batch to the normal bulk-ingest dataflow
  * (partition-tag → repartition → sorted write → state-store commit), so
  * streamed rows land exactly like bulk-imported ones (T3 continual
  * aggregation then applies at compaction).
  */
final class StreamingIngest(
    table: GraftTable,
    inboxDir: String,
    checkpointDir: String,
    minBatchFiles: Int = 1,
    maxBatchAgeMs: Long = 0L,
    /** shaping hook applied to each micro-batch BEFORE ingest — the seam
      * streaming curation composes through (e.g.
      * [[StreamingDedup.againstTable]] drops rows whose text the table
      * already holds). Runs inside foreachBatch; a crash-replayed batch
      * re-runs it, but the replay's ingest is skipped by the txn
      * watermark, so the hook needs no determinism for exactly-once —
      * though a deterministic hook keeps replay logs comprehensible.
      */
    batchTransform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      identity)
  extends InboxMicroBatcher(table, inboxDir, checkpointDir, minBatchFiles, maxBatchAgeMs) {

  protected def sourceSchema: org.apache.spark.sql.types.StructType =
    table.schema.toStructType

  protected def applyBatch(batch: org.apache.spark.sql.DataFrame,
      appId: String, batchId: Long): Unit = {
    val schema = table.schema
    val shaped = batchTransform(batch)
    if (!shaped.isEmpty) {
      table.ingest(shaped.select(schema.allFields.map(f => shaped(f.name)): _*),
        txn = Some((appId, batchId)))
    }
  }
}

/** Continuous micro-batch CDC apply: the streaming form of
  * [[graft.table.GraftTable.merge]]. Inbox files carry the table schema
  * plus an `opColumn` (e.g. `_op`); each micro-batch lands as ONE atomic
  * Merge commit — puts as a new write generation, `deleteOp` rows as
  * row-key delete markers one generation below — under the same
  * idempotent txn watermark as streaming ingest, so a crash-replayed
  * batch neither re-puts nor re-deletes. On a last-write-wins table this
  * is a continuously-applied CDC feed (the Delta `foreachBatch` + MERGE
  * INTO idiom, with the atomicity inside the engine instead of the
  * user's batch function).
  */
final class StreamingMerge(
    table: GraftTable,
    inboxDir: String,
    checkpointDir: String,
    opColumn: String = "_op",
    deleteOp: String = "delete",
    minBatchFiles: Int = 1,
    maxBatchAgeMs: Long = 0L)
  extends InboxMicroBatcher(table, inboxDir, checkpointDir, minBatchFiles, maxBatchAgeMs) {

  protected def sourceSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      table.schema.toStructType.fields :+
        org.apache.spark.sql.types.StructField(
          opColumn, org.apache.spark.sql.types.StringType, nullable = true))

  protected def applyBatch(batch: org.apache.spark.sql.DataFrame,
      appId: String, batchId: Long): Unit = {
    table.merge(batch, org.apache.spark.sql.functions.col(opColumn) === deleteOp,
      txn = Some((appId, batchId)))
    ()
  }
}

/** Shared inbox micro-batch machinery: the file-source checkpoint
  * decides which inbox files feed which micro-batch; subclasses define
  * the batch schema and the (idempotent, watermarked) table commit.
  */
abstract class InboxMicroBatcher(
    table: GraftTable,
    inboxDir: String,
    checkpointDir: String,
    minBatchFiles: Int,
    maxBatchAgeMs: Long) {

  protected def sourceSchema: org.apache.spark.sql.types.StructType
  protected def applyBatch(batch: org.apache.spark.sql.DataFrame,
      appId: String, batchId: Long): Unit

  private def markerPath: String = s"$checkpointDir/batched-files.txt"
  private def streamIdPath: String = s"$checkpointDir/stream-id"

  /** Stable stream identity: minted once, persisted with the checkpoint.
    * Minting is CREATE-EXCLUSIVE (no overwrite): two racing drivers on one
    * checkpoint both observe the single winner's identity instead of each
    * writing its own. A checkpoint that predates the identity file (it
    * already has offsets or a batch marker) committed its watermarks under
    * the legacy appId `stream:<checkpointDir>` — seed the file with the
    * checkpoint path so a crash-replayed micro-batch straddling the
    * upgrade still deduplicates against the old watermark.
    */
  private def streamId(): String = {
    val (fs, p) = GraftFS.resolve(streamIdPath)
    if (!fs.exists(p)) {
      GraftFS.mkdirs(checkpointDir)
      val legacyCheckpoint =
        GraftFS.exists(markerPath) || GraftFS.exists(s"$checkpointDir/offsets")
      val id = if (legacyCheckpoint) checkpointDir else java.util.UUID.randomUUID().toString
      try {
        val out = fs.create(p, false) // create-exclusive: lose the race, adopt the winner's id
        try out.write(id.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
      } catch { case _: java.io.IOException => () }
    }
    // the winner may still be mid-fill; wait out the (tiny) create-to-write window
    var read = GraftFS.readString(streamIdPath).trim
    var waited = 0
    while (read.isEmpty && waited < 100) {
      Thread.sleep(10); waited += 1
      read = GraftFS.readString(streamIdPath).trim
    }
    require(read.nonEmpty, s"empty stream identity at $streamIdPath")
    read
  }

  private def batchedFiles(): Set[String] =
    if (GraftFS.exists(markerPath))
      GraftFS.readString(markerPath).linesIterator.filter(_.nonEmpty).toSet
    else Set.empty

  private def listInbox(): Seq[org.apache.hadoop.fs.FileStatus] =
    GraftFS.list(inboxDir).filter(_.getPath.getName.endsWith(".parquet"))

  /** Files in the inbox no prior cycle was asked to process. */
  def pendingFiles(): Seq[org.apache.hadoop.fs.FileStatus] = {
    val seen = batchedFiles()
    listInbox().filterNot(st => seen.contains(st.getPath.toUri.getPath))
  }

  /** Batcher decision + one micro-batch cycle. Returns the number of
    * pending files the cycle was dispatched for (0 = below the batch
    * threshold, nothing ran). `maxBatchAgeMs <= 0` disables age forcing
    * (files wait for the min batch size indefinitely).
    */
  def runOnce(nowMs: Long = System.currentTimeMillis()): Int = {
    val pending = pendingFiles()
    if (pending.isEmpty) return 0
    val oldestAge = nowMs - pending.map(_.getModificationTime).min
    val ageForces = maxBatchAgeMs > 0 && oldestAge >= maxBatchAgeMs
    if (pending.size < minBatchFiles && !ageForces) return 0

    val appId = s"stream:${streamId()}"
    val spark = table.spark
    StreamTuning.tune(spark, Some(checkpointDir))
    val stream = spark.readStream
      .schema(sourceSchema)
      .parquet(inboxDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) applyBatch(batch, appId, batchId)
        ()
      }
      .start()
    stream.awaitTermination()

    GraftFS.mkdirs(checkpointDir)
    GraftFS.writeString(markerPath,
      (batchedFiles() ++ pending.map(_.getPath.toUri.getPath)).toSeq.sorted.mkString("\n"))
    pending.size
  }
}

/** Streaming-curation batch transforms for [[StreamingIngest]]. */
object StreamingDedup {

  /** Drop batch rows whose `textCol` the table already holds, and keep
    * one row per text WITHIN the batch (smallest row keys win —
    * deterministic). The against-table gate is [[graft.dedup.Dedup
    * .bloomDedup]]: the table's texts compress into a Bloom filter that
    * rides a broadcast and probes inside codegen, so only probe-hits
    * reach an exact confirmation join — each micro-batch pays map-side
    * work plus a join sized by the (tiny) maybe-duplicate set, not by
    * the table. The filter is rebuilt per batch from the table's
    * CURRENT contents, so rows ingested by earlier batches gate later
    * ones.
    *
    * Null-text rows follow the codebase's null convention (Dedup
    * .dedupExact's nullWinner routing, bloomDedup's NOT-EXISTS
    * semantics): every null-text row is its own winner, so the in-batch
    * window dedup applies only to rows where `textCol IS NOT NULL` and
    * null-text rows pass through unchanged — without the split, all
    * null rows would share one window partition and collapse to 1.
    */
  def againstTable(table: GraftTable, textCol: String): org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame = { batch =>
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val keys = table.schema.keyNames.map(col)
    val nonNull = batch.filter(col(textCol).isNotNull)
    val nulls = batch.filter(col(textCol).isNull)
    val inBatch = nonNull
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(textCol)).orderBy(keys: _*)))
      .filter(col("__rn") === 1).drop("__rn")
      .unionByName(nulls)
    graft.dedup.Dedup.bloomDedup(inBatch, table.toDF.select(col(textCol)), textCol)
  }

  /** EXACT cross-batch streaming dedup with KEYED STATE — the
    * `flatMapGroupsWithState` shape: the stream groups by text, each
    * group keeps one boolean "seen" flag in the state store, and only a
    * key's FIRST batch emits a row (the group's min-id row, so the
    * emission is deterministic however the batch's rows are ordered).
    * Unlike the per-batch Bloom gate above — probabilistic against the
    * TABLE, rebuilt per batch — this is the continuously-running exact
    * form: the state store carries seen-ness across every micro-batch
    * for the stream's whole lifetime, checkpointed with the query.
    *
    * Scale: state is one boolean per distinct text, partitioned by the
    * group key across executors (Spark's streaming state store);
    * grouping here is by the text itself for exactness — a 100-TB
    * deployment keys by a 128-bit hash so the state and shuffle carry
    * 16 bytes a key. Output mode Append; no timeout (dedup state never
    * expires — pair with watermark-based state TTL if the corpus is
    * unbounded and re-emission after N days is acceptable).
    */
  def firstOccurrences(stream: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.Dataset[(Long, String)] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .groupByKey { case (_, text) => text }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String)],
            state: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(_._1))
          }
      }
  }

  /** [[firstOccurrences]] with WATERMARK-DRIVEN STATE TTL — the
    * unbounded-corpus form. Plain `firstOccurrences` never expires
    * state: on a stream that runs forever over 100 TB+, the store
    * grows one entry per distinct text with no ceiling — the real
    * scale flaw of the no-timeout shape. Here each key's state carries
    * an event-time expiry (max event time seen for the key + `ttlMs`);
    * once the watermark passes it, Spark invokes the group with
    * `hasTimedOut` and the state is dropped. The documented trade: a
    * text re-arriving AFTER its state expired re-emits (dedup horizon =
    * TTL), which is the contract every windowed-dedup deployment
    * accepts in exchange for bounded state.
    *
    * Mechanics: the stream must carry an event-time column; a watermark
    * of `watermarkDelay` bounds late data; the timeout timestamp is
    * clamped above the current watermark (Spark rejects expiries in the
    * past — a late straggler batch must not set one). The per-group
    * iterator is buffered only within one key × one micro-batch
    * (bounded by per-key batch volume, not stream history).
    */
  def firstOccurrencesWithTtl(stream: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, eventTimeCol: String,
      watermarkDelay: String, ttlMs: Long): org.apache.spark.sql.Dataset[(Long, String)] = {
    require(ttlMs > 0, "ttlMs must be positive")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    // cast BEFORE the watermark: a cast applied after withWatermark
    // produces a new attribute without the watermark metadata, and the
    // unsupported-operation checker then rejects the event-time timeout
    stream.select(col(idCol).cast("long"), col(textCol),
        col(eventTimeCol).cast("timestamp").as(eventTimeCol))
      .withWatermark(eventTimeCol, watermarkDelay)
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey { case (_, text, _) => text }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[(Long, String, java.sql.Timestamp)],
            state: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toVector // one key's rows of ONE micro-batch
            val first = !state.exists
            state.update(true)
            val maxTs = batch.iterator.map(_._3.getTime).max
            val floor = state.getCurrentWatermarkMs() + 1
            state.setTimeoutTimestamp(math.max(maxTs + ttlMs, floor))
            if (first) {
              val m = batch.minBy(_._1)
              Iterator.single((m._1, m._2))
            } else Iterator.empty
          }
      }
  }
}
