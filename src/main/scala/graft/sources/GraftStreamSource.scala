package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import graft.core.GraftField
import graft.exec.{GroupRowIterator, VectorizedRowIterator}
import graft.meta.JsonStateStore

/** Stream offset = state-store version: every commit is a full snapshot
  * with a monotonically increasing version, so the version chain IS the
  * change log.
  */
case class GraftStreamOffset(version: Long) extends Offset {
  override def json: String = version.toString
}

/** Table-changes micro-batch source (Delta-style `readStream` on a
  * table): each state-store version is an offset, and a micro-batch is
  * the set of `dataChange` files committed in `(start, end]` — ingested
  * files exactly once, compaction outputs never (their rows were already
  * streamed from the files they merged; `FileReference.dataChange`).
  *
  * Semantics: the stream is the table's APPEND LOG — raw rows as
  * ingested, BEFORE compaction-time continual aggregation or persistent
  * filters. Downstream aggregation of the stream reproduces the table
  * for decomposable aggregates (sum/min/max/map_*), which is exactly the
  * contract a derived streaming pipeline needs. Starting offset is
  * version 0, so the first micro-batch carries the whole existing table.
  *
  * Bounded history, like the reference's transaction log and Delta
  * vacuum: a restart is valid while the snapshot chain retains the
  * checkpointed version AND GC has not deleted files committed since —
  * an out-of-retention restart fails loudly rather than silently
  * skipping data.
  */
final class GraftMicroBatchStream(dir: String, readFields: Seq[GraftField])
  extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private def meta = s"$dir/meta"

  @volatile private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = GraftStreamOffset(0L)

  override def latestOffset(): Offset =
    GraftStreamOffset(JsonStateStore.load(meta).currentVersion)

  // -- admission control / AvailableNow ---------------------------------
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    availableNowTarget match {
      case Some(v) => GraftStreamOffset(v)
      case None => latestOffset()
    }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(JsonStateStore.load(meta).currentVersion)

  override def reportLatestOffset(): Offset = latestOffset()

  // ---------------------------------------------------------------------

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  /** Distinct data files present at a version, keyed by filename (a
    * split can reference one file from several partitions) with the
    * physical home directory; version 0 = the empty table.
    */
  private def filesAt(version: Long): Map[String, (String, Boolean)] =
    if (version <= 0L) Map.empty
    else JsonStateStore.loadAt(meta, version).fileReferences
      .map(r => r.filename -> (r.physicalPartitionId, r.dataChange)).toMap

  /** EVERY version in `(start, end]` is walked, not just the endpoints
    * diffed: a file ingested and then compacted away inside the window
    * exists in neither endpoint snapshot, and an endpoint diff would
    * silently lose its rows (caught by the restart spec). Walking is
    * bounded by snapshot retention; a checkpoint older than that fails
    * loudly below rather than skipping data.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val sv = start.asInstanceOf[GraftStreamOffset].version
    val ev = end.asInstanceOf[GraftStreamOffset].version
    if (ev <= sv) return Array.empty
    // Initial load (start of a fresh stream) is SNAPSHOT semantics: all
    // live files at `ev`, dataChange irrelevant — a replace commit never
    // leaves an output and its inputs live together, so the snapshot
    // carries each ingested row exactly once even on a pre-compacted
    // table (where most live files are dataChange=false and a diff-style
    // filter would lose the whole initial load). Incremental batches
    // below then diff forward from exactly that file set.
    if (sv == 0L) {
      return filesAt(ev).map { case (name, (home, _)) =>
        GraftStreamFilePartition(s"$dir/data/$home/$name"): InputPartition
      }.toArray
    }
    val seen = scala.collection.mutable.Set.empty[String] ++= filesAt(sv).keys
    val parts = Array.newBuilder[InputPartition]
    var v = sv + 1
    while (v <= ev) {
      val cur =
        try filesAt(v)
        catch {
          case e: IllegalStateException => throw new IllegalStateException(
            s"table-changes stream cannot recover: version $v inside the " +
              s"micro-batch window ($sv, $ev] is no longer retained — the " +
              "checkpoint is older than the snapshot retention window; " +
              "restart the stream from a fresh checkpoint", e)
        }
      cur.foreach { case (name, (home, dataChange)) =>
        if (dataChange && !seen.contains(name)) {
          seen += name
          parts += GraftStreamFilePartition(s"$dir/data/$home/$name")
        }
      }
      v += 1
    }
    parts.result()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftStreamReaderFactory(readFields)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class GraftStreamFilePartition(path: String) extends InputPartition

/** Reads one appended file through the same row sources the merge path
  * uses (vectorized for atomic schemas, record-materializing for nested
  * types) — within-file key order is preserved, no merge semantics.
  */
final case class GraftStreamReaderFactory(readFields: Seq[GraftField])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[GraftStreamFilePartition].path
    val vectorizable = readFields.forall(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: org.apache.spark.sql.types.StructType => false
      case _ => true
    })
    val source =
      if (vectorizable) new VectorizedRowIterator(path, readFields)
      else new GroupRowIterator(path, readFields)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (source.hasNext) { current = source.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = source.close()
    }
  }
}
