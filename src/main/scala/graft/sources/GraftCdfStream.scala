package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.GraftField
import graft.exec.{GroupRowIterator, VectorizedRowIterator}
import graft.meta.{JsonStateStore, SerializableHadoopConf}
import graft.table.ChangeFeed

/** Streaming change-data-feed (Delta CDF's `readChangeFeed` for this
  * engine): every row change — puts AND row-key deletes — as a stream,
  *
  *   spark.readStream.format("graft")
  *     .option("readChangeFeed", "true").load(dir)
  *
  * with three appended columns: `_op` ("put" | "delete"), `_commit_
  * version`, and `_commit_seq` (the write generation — the within-
  * version commit order once batched commits can fold several logical
  * commits into one log version). Delete rows carry the row keys and
  * NULL value columns.
  *
  * Contract (the streaming form of `changesBetween` +
  * `deletedKeysBetween`): rows are delivered AS COMMITTED — raw
  * generations and delete markers, before continual aggregation —
  * and a consumer resolves per key by (_commit_version, _commit_seq)
  * with puts winning ties (a MERGE stamps its markers one generation
  * below its puts). This is what lifts the append-only stream's
  * documented gap: the insert feed must refuse pending tombstones (no
  * retract records); the CDF stream DELIVERS them — the initial batch
  * is the live snapshot's files plus its pending markers, each carrying
  * its true generation, so delete-then-reingest resolves exactly as the
  * table itself resolves it.
  *
  * Same bounded-history contract as the insert stream: restarts are
  * valid while the snapshot chain retains the checkpointed version and
  * GC has not deleted files committed since.
  */
final class GraftCdfMicroBatchStream(dir: String, tableFields: Seq[GraftField],
    keyFields: Seq[GraftField],
    maxVersionsPerTrigger: Option[Long] = None) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private def meta = s"$dir/meta"

  @volatile private var availableNowTarget: Option[Long] = None

  private def currentVersion: Long =
    JsonStateStore.latestVersionIn(meta).getOrElse(
      throw new IllegalStateException(s"no state snapshot in $meta"))

  override def initialOffset(): Offset = GraftStreamOffset(0L)
  override def latestOffset(): Offset = GraftStreamOffset(currentVersion)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Same catch-up cap as the table-changes stream (see
    * GraftMicroBatchStream.latestOffset): bounded batches when resuming
    * far behind, never applied to the initial snapshot batch.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startV = start.asInstanceOf[GraftStreamOffset].version
    val end = availableNowTarget.getOrElse(currentVersion)
    val capped = maxVersionsPerTrigger match {
      case Some(m) if startV > 0L => math.min(end, startV + m)
      case _ => end
    }
    GraftStreamOffset(math.max(capped, startV))
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(currentVersion)

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val sv = start.asInstanceOf[GraftStreamOffset].version
    val ev = end.asInstanceOf[GraftStreamOffset].version
    if (ev <= sv) return Array.empty
    if (sv == 0L) {
      // Initial load, snapshot semantics: every live data file as puts
      // plus every PENDING delete marker, each at its true generation —
      // a consumer resolving by (version, seq) reconstructs exactly the
      // table's own read (re-ingests above their markers survive).
      val st = JsonStateStore.loadAt(meta, ev)
      val puts = st.fileReferences.map(r =>
        (graft.meta.GraftFS.dataPath(dir, r.physicalPartitionId, r.filename), false, r.seq))
        .distinct
      val dels = st.tombstones.map(t =>
        (graft.meta.GraftFS.dataPath(dir, t.physicalPartitionId, t.filename), true, t.seq))
        .distinct
      return (puts ++ dels).map { case (p, del, seq) =>
        GraftCdfFilePartition(p, del, ev, seq): InputPartition
      }.toArray
    }
    // Incremental: the same per-version manifest walk as the batch CDC
    // feeds (snapshot-diff fallback included) — compaction outputs never
    // appear (dataChange=false), tombstones appear exactly once.
    ChangeFeed.walk(meta, sv, ev).map { e =>
      GraftCdfFilePartition(graft.meta.GraftFS.dataPath(dir, e.home, e.filename),
        e.isTombstone, e.version, e.seq): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftCdfReaderFactory(tableFields, keyFields, graft.meta.GraftFS.serializableConf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class GraftCdfFilePartition(path: String, isDelete: Boolean,
    version: Long, seq: Long) extends InputPartition

/** Reads one changed file and appends (_op, _commit_version,
  * _commit_seq). Delete-marker files carry only the row-key columns;
  * their value slots are served as NULL.
  */
final case class GraftCdfReaderFactory(tableFields: Seq[GraftField],
    keyFields: Seq[GraftField], conf: SerializableHadoopConf)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftCdfFilePartition]
    val readFields = if (p.isDelete) keyFields else tableFields
    val vectorizable = readFields.forall(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: org.apache.spark.sql.types.StructType => false
      case _ => true
    })
    val source =
      if (vectorizable) new VectorizedRowIterator(p.path, readFields, conf = conf.value)
      else new GroupRowIterator(p.path, readFields, conf = conf.value)
    val op = UTF8String.fromString(if (p.isDelete) "delete" else "put")
    val n = tableFields.size
    // delete files hold keys only: map each table slot to its position
    // in the read row, or -1 (NULL)
    val slot: Array[Int] =
      if (!p.isDelete) Array.tabulate(n)(identity)
      else tableFields.map(f => keyFields.indexWhere(_.name == f.name)).toArray
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (source.hasNext) {
          val row = source.next()
          val out = new GenericInternalRow(n + 3)
          var i = 0
          while (i < n) {
            val s = slot(i)
            out.update(i, if (s < 0) null else row.get(s, tableFields(i).dataType))
            i += 1
          }
          out.update(n, op)
          out.update(n + 1, p.version)
          out.update(n + 2, p.seq)
          current = out
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = source.close()
    }
  }
}
