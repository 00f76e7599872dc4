package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import graft.core.GraftField
import graft.exec.{GroupRowIterator, VectorizedRowIterator}
import graft.meta.{JsonStateStore, SerializableHadoopConf}

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
  * ingested, BEFORE compaction-time continual aggregation. Downstream
  * aggregation of the stream reproduces the table for decomposable
  * aggregates (sum/min/max/map_*), which is exactly the contract a
  * derived streaming pipeline needs. Tables with a persistent
  * filterConfig or transformConfig are REFUSED at stream build
  * (GraftScan.toMicroBatchStream): the append log cannot apply them,
  * and silently streaming rows a batch read would suppress is a leak.
  * Starting offset is version 0, so the first micro-batch carries the
  * whole existing table.
  *
  * Bounded history, like the reference's transaction log and Delta
  * vacuum: a restart is valid while the snapshot chain retains the
  * checkpointed version AND GC has not deleted files committed since —
  * an out-of-retention restart fails loudly rather than silently
  * skipping data.
  */
final class GraftMicroBatchStream(dir: String, readFields: Seq[GraftField],
    fallbackKeyField: GraftField,
    maxVersionsPerTrigger: Option[Long] = None) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private def meta = s"$dir/meta"

  @volatile private var availableNowTarget: Option[Long] = None

  /** Filename listing only — no snapshot parse on the poll path. */
  private def currentVersion: Long =
    JsonStateStore.latestVersionIn(meta).getOrElse(
      throw new IllegalStateException(s"no state snapshot in $meta"))

  override def initialOffset(): Offset = GraftStreamOffset(0L)

  override def latestOffset(): Offset = GraftStreamOffset(currentVersion)

  // -- admission control / AvailableNow ---------------------------------
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Catch-up rate limit: a stream resuming far behind the table head
    * otherwise walks EVERY pending version in one micro-batch —
    * `maxVersionsPerTrigger` caps each batch's window so a month-behind
    * checkpoint on a busy table drains as bounded batches (exactly-once
    * either way; AvailableNow keeps triggering until the prepared target
    * is reached). The cap never applies to the INITIAL batch: version 0
    * plans snapshot semantics from the END version's file set, and an
    * artificial early endpoint could fall outside snapshot retention.
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

  // ---------------------------------------------------------------------

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  /** Distinct data files present at a version, keyed by filename (a
    * split can reference one file from several partitions) with the
    * physical home directory; version 0 = the empty table. Wraps an
    * out-of-retention version in the stream-recovery message.
    */
  private def filesAt(version: Long, window: (Long, Long)): Map[String, (String, Boolean)] =
    if (version <= 0L) Map.empty
    else try {
      JsonStateStore.loadAt(meta, version).fileReferences
        .map(r => r.filename -> (r.physicalPartitionId, r.dataChange)).toMap
    } catch {
      case e: IllegalStateException => throw new IllegalStateException(
        s"table-changes stream cannot recover: version $version inside the " +
          s"micro-batch window (${window._1}, ${window._2}] is no longer " +
          "retained — the checkpoint is older than the snapshot retention " +
          "window; restart the stream from a fresh checkpoint", e)
    }

  /** EVERY version in `(start, end]` is walked, not just the endpoints
    * diffed: a file ingested and then compacted away inside the window
    * exists in neither endpoint snapshot, and an endpoint diff would
    * silently lose its rows (caught by the restart spec). Walking is
    * bounded by snapshot retention; a checkpoint older than that fails
    * loudly rather than skipping data.
    *
    * The walk reads per-version DELTA manifests (`delta-v{N}.json`,
    * written at commit), so a catch-up batch over a 50-version window on
    * a 100k-file table plans from 50 tiny added-file lists instead of 50
    * full snapshot parses — O(changes), not O(window × table). A version
    * missing its manifest (pre-delta history, or a writer that crashed
    * between snapshot and delta) falls back to diffing that version's
    * snapshot against its predecessor's — with the predecessor parse
    * cached, so even an all-fallback window parses each snapshot once.
    * Filenames are UUIDs (never reused), so "added at v" sets are
    * pairwise disjoint and disjoint from the start snapshot — no
    * cross-version seen-set is needed.
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
      return filesAt(ev, (sv, ev)).map { case (name, (home, _)) =>
        GraftStreamFilePartition(graft.meta.GraftFS.dataPath(dir, home, name)): InputPartition
      }.toArray
    }
    val parts = Array.newBuilder[InputPartition]
    // fallback snapshot cache: (version, parsed file map) — consecutive
    // fallbacks reuse the previous iteration's endpoint
    var cached: (Long, Map[String, (String, Boolean)]) = null
    def snapshotAt(v: Long): Map[String, (String, Boolean)] = {
      if (cached == null || cached._1 != v) cached = (v, filesAt(v, (sv, ev)))
      cached._2
    }
    var v = sv + 1
    while (v <= ev) {
      JsonStateStore.deltaAddedAt(meta, v) match {
        case Some(added) =>
          added.foreach { e =>
            // tombstone entries carry dataChange=false, so delete files
            // never enter the stream
            if (e.dataChange) parts += GraftStreamFilePartition(graft.meta.GraftFS.dataPath(dir, e.home, e.filename))
          }
        case None =>
          val prev = snapshotAt(v - 1)
          val cur = filesAt(v, (sv, ev))
          cached = (v, cur)
          cur.foreach { case (name, (home, dataChange)) =>
            if (dataChange && !prev.contains(name))
              parts += GraftStreamFilePartition(graft.meta.GraftFS.dataPath(dir, home, name))
          }
      }
      v += 1
    }
    parts.result()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // capture the driver's Hadoop configuration: executors resolve the
    // table's filesystem (credentials, fs.defaultFS) with it — same as
    // the batch GraftReaderFactory
    GraftStreamReaderFactory(readFields, fallbackKeyField,
      graft.meta.GraftFS.serializableConf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class GraftStreamFilePartition(path: String) extends InputPartition

/** Reads one appended file through the same row sources the merge path
  * uses (vectorized for atomic schemas, record-materializing for nested
  * types) — within-file key order is preserved, no merge semantics.
  */
final case class GraftStreamReaderFactory(readFields: Seq[GraftField],
    fallbackKeyField: GraftField, conf: SerializableHadoopConf)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[GraftStreamFilePartition].path
    // Empty projection (streaming COUNT(*)): the vectorized bridge is
    // never opened with zero fields (the batch path routes this case to
    // the row path too) — read one key column and emit empty rows.
    val countOnly = readFields.isEmpty
    val fields = if (countOnly) Seq(fallbackKeyField) else readFields
    val vectorizable = !countOnly && fields.forall(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: org.apache.spark.sql.types.StructType => false
      case _ => true
    })
    val source =
      if (vectorizable) new VectorizedRowIterator(path, fields, conf = conf.value)
      else new GroupRowIterator(path, fields, conf = conf.value)
    val empty = new GenericInternalRow(0)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (source.hasNext) {
          current = if (countOnly) { source.next(); empty } else source.next()
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = source.close()
    }
  }
}
