package graft.streaming

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.streaming.Trigger
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
  * (StateStore.addFilesIfAbsent keyed on the checkpoint location, with
  * the batch id as the monotonically-increasing version — Delta's `txn`
  * model, O(#streams) state, not O(#batches)). foreachBatch alone is
  * only at-least-once — a crash after the table commit but before the
  * checkpoint commit replays the batch — but the replay carries an
  * already-committed version and skips. The batcher's own pending-file
  * marker only gates WHEN a cycle runs; a stale marker can delay a
  * batch, never duplicate or lose one.
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
    maxBatchAgeMs: Long = 0L) {

  private def markerPath: Path = Paths.get(checkpointDir, "batched-files.txt")

  private def batchedFiles(): Set[String] =
    if (Files.exists(markerPath)) Files.readAllLines(markerPath).asScala.toSet else Set.empty

  private def listInbox(): Seq[Path] = {
    val inbox = Paths.get(inboxDir)
    if (!Files.exists(inbox)) Nil
    else Files.list(inbox).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
  }

  /** Files in the inbox no prior cycle was asked to process. */
  def pendingFiles(): Seq[Path] = {
    val seen = batchedFiles()
    listInbox().filterNot(p => seen.contains(p.toString))
  }

  /** Batcher decision + one micro-batch cycle. Returns the number of
    * pending files the cycle was dispatched for (0 = below the batch
    * threshold, nothing ran). `maxBatchAgeMs <= 0` disables age forcing
    * (files wait for the min batch size indefinitely).
    */
  def runOnce(nowMs: Long = System.currentTimeMillis()): Int = {
    val pending = pendingFiles()
    if (pending.isEmpty) return 0
    val oldestAge = nowMs - pending.map(p => Files.getLastModifiedTime(p).toMillis).min
    val ageForces = maxBatchAgeMs > 0 && oldestAge >= maxBatchAgeMs
    if (pending.size < minBatchFiles && !ageForces) return 0

    val spark = table.spark
    val schema = table.schema
    val stream = spark.readStream
      .schema(schema.toStructType)
      .parquet(inboxDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          table.ingest(batch.select(schema.allFields.map(f => batch(f.name)): _*),
            txn = Some((s"stream:$checkpointDir", batchId)))
        }
        ()
      }
      .start()
    stream.awaitTermination()

    Files.createDirectories(markerPath.getParent)
    Files.write(markerPath,
      (batchedFiles() ++ pending.map(_.toString)).toSeq.sorted.asJava)
    pending.size
  }
}
