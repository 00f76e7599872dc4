package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{GraftField, KeyOrdering, PartitionTree}
import graft.meta.{FileReference, GraftFS, SerializableHadoopConf}

/** Native structured-streaming SINK (`df.writeStream.format("graft")`):
  * any streaming pipeline — file feeds, memory streams, arbitrary
  * transforms — lands in a graft table with exactly-once epochs, not
  * just the inbox-directory pattern ([[graft.streaming.StreamingIngest]]).
  *
  * Dataflow per micro-batch: each writer task buffers its partition's
  * rows, sorts them by the table's key order, and writes ONE root-homed
  * key-sorted parquet file (the small-batch shared-file shape — a
  * micro-batch never writes per-leaf files), counting rows per leaf as
  * it goes. The driver's epoch commit writes the sketch sidecars, then
  * lands every task's refs in ONE atomic version whose idempotent-txn
  * watermark is (`sink:<queryId>`, epochId) — a crash-replayed epoch
  * neither re-lands rows nor advances state, and its orphan files are
  * removed ([[graft.meta.StateStore.addFilesIfAbsent]], the same
  * exactly-once contract as streaming ingest). One epoch = one write
  * generation, so `last(...)` tables resolve micro-batches in arrival
  * order.
  *
  * The buffer-then-sort is sized for MICRO-batches (the structured-
  * streaming regime); bulk history loads should use `GraftTable.ingest`
  * (spill-safe sort, per-leaf parallel layout).
  */
/** Opt-in post-commit ANN-index maintenance for a streamed table: every
  * `every` landed epochs, reconcile the persisted IVF(-PQ) index at
  * `indexDir` from the table's change feed
  * ([[graft.vectors.VectorFunctions.syncIndexWithTable]]) — the
  * "streaming ingest keeps the index fresh" loop, driven by the sink
  * instead of a human.
  */
final case class IndexSyncSpec(indexDir: String, idCol: String,
    vecCol: String, every: Int, pq: Boolean)

final class GraftStreamingWrite(dir: String, queryId: String,
    tableFields: Seq[GraftField], keyNames: Seq[String], rowKeyNames: Seq[String],
    tree: PartitionTree, autoCompactEvery: Option[Int] = None,
    indexSync: Option[IndexSyncSpec] = None) extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftSinkWriterFactory(dir, tableFields, keyNames, rowKeyNames, tree,
      GraftFS.serializableConf)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case m: GraftSinkFile if m.counts.nonEmpty => m }
    if (files.isEmpty) return
    val spark = org.apache.spark.sql.SparkSession.active
    val table = graft.table.GraftTable.load(spark, dir)
    // sidecars BEFORE the commit that makes the files visible (the
    // sidecar-cache soundness invariant shared with ingest/compaction)
    new graft.jobs.Ingest(table).writeSketches(
      files.map(f => table.filePath(f.home, f.name)).toSeq,
      files.map(_.counts.values.sum).max)
    val refs = files.flatMap(f => f.counts.toSeq.sortBy(_._1).map { case (pid, n) =>
      FileReference(f.name, pid, n, homeId = Some(f.home))
    }).toSeq
    if (!table.store.addFilesIfAbsent(s"sink:$queryId", epochId, refs)) {
      // replayed epoch: the rows are already committed — drop this
      // attempt's orphan files and sidecars
      files.foreach { f =>
        GraftFS.delete(table.filePath(f.home, f.name))
        GraftFS.delete(table.filePath(f.home, f.name) + ".sketches")
      }
    } else {
      autoCompactEvery.foreach { n =>
      // Streaming MAINTENANCE loop (VERDICT r14 #8): a week-long stream
      // otherwise accumulates one sorted run per leaf per micro-batch
      // until a human runs compaction. Opt-in writeStream option
      // `autoCompactEvery=N`: every N epochs THAT LANDED FILES (empty
      // micro-batches return above and never count), run the basic
      // strategy synchronously between micro-batches — the commit
      // callback runs on the stream's driver thread, so compaction
      // never races the next epoch's file additions, and a compaction
      // failure fails the query loudly rather than silently degrading
      // into an ever-deeper merge fan-in. N is counted in a driver-side
      // per-(table,query) counter, NOT on the raw epochId modulus —
      // with empty batches interleaved, data could otherwise keep
      // missing the modulus and defer compaction without bound. (Spark
      // builds a FRESH StreamingWrite per micro-batch, so the counter
      // cannot live in this instance; a driver restart resets it, which
      // only delays the next compaction by < N landed epochs.)
      if (GraftStreamingWrite.landedSinceCompact(dir, queryId) >= n) {
        table.compact(graft.jobs.BasicCompactionStrategy())
        GraftStreamingWrite.resetLanded(dir, queryId)
      }
      }
      // same landed-epoch discipline as auto-compaction — inside the
      // LANDED branch, so a REPLAYED epoch (files dropped as orphans
      // above) bumps neither counter; the sync itself is incremental —
      // O(this window's changed rows) via the table's CDC feeds — and
      // runs on the stream's driver thread between micro-batches, so it
      // never races the next epoch's commit
      indexSync.foreach { spec =>
        if (GraftStreamingWrite.landedSinceSync(dir, queryId) >= spec.every) {
          val spark = org.apache.spark.sql.SparkSession.active
          val t = graft.table.GraftTable.load(spark, dir)
          graft.vectors.VectorFunctions.syncIndexWithTable(
            t, spec.idCol, spec.vecCol, spec.indexDir, pq = spec.pq)
          GraftStreamingWrite.resetSync(dir, queryId)
        }
      }
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      // empty-writer messages carry no file — guard, or the path would
      // name the partition directory itself
      case m: GraftSinkFile if m.name.nonEmpty =>
        GraftFS.delete(s"$dir/data/${m.home}/${m.name}")
        GraftFS.delete(s"$dir/data/${m.home}/${m.name}.sketches")
      case _ => ()
    }
}

object GraftStreamingWrite {
  /** Landed-epoch counters for the auto-compaction trigger, keyed
    * (table dir, query id): Spark constructs a fresh [[GraftStreamingWrite]]
    * per micro-batch, so the count of epochs-with-data must live
    * driver-wide. Entries are O(active streams) and reset on each
    * compaction.
    */
  private val landed = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def key(dir: String, queryId: String): String = dir + "\u0000" + queryId
  private def bump(k: String): Long =
    landed.merge(k, java.lang.Long.valueOf(1L),
      (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue)).longValue
  private[sources] def landedSinceCompact(dir: String, queryId: String): Long =
    bump("compact:" + key(dir, queryId))
  private[sources] def resetLanded(dir: String, queryId: String): Unit =
    landed.remove("compact:" + key(dir, queryId))
  private[sources] def landedSinceSync(dir: String, queryId: String): Long =
    bump("sync:" + key(dir, queryId))
  private[sources] def resetSync(dir: String, queryId: String): Unit =
    landed.remove("sync:" + key(dir, queryId))
}

final case class GraftSinkFile(name: String, home: String,
    counts: Map[String, Long]) extends WriterCommitMessage

final case class GraftSinkWriterFactory(dir: String, tableFields: Seq[GraftField],
    keyNames: Seq[String], rowKeyNames: Seq[String], tree: PartitionTree,
    conf: SerializableHadoopConf) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftSinkWriter(dir, tableFields, keyNames, rowKeyNames, tree, conf.value)
}

object GraftSinkWriter {
  /** Heap budget per writer task: a partition buffering past this many
    * bytes spills its sorted run to local disk and keeps going, so a
    * large backfill pointed at `writeStream.format("graft")` degrades to
    * an external merge sort instead of an executor OOM. Read per writer
    * so tests can drive the spill path (`-Dgraft.sink.spillBytes`).
    */
  def spillBytes: Long = sys.props.get("graft.sink.spillBytes")
    .map(_.toLong).getOrElse(256L * 1024 * 1024)
}

/** Buffers one task's micro-batch partition (bounded — see
  * [[GraftSinkWriter.spillBytes]]; overflow spills key-sorted runs to
  * local disk), merges buffer + runs in key order at commit, and writes
  * one root-homed shared file with exact per-leaf counts.
  */
final class GraftSinkWriter(dir: String, tableFields: Seq[GraftField],
    keyNames: Seq[String], rowKeyNames: Seq[String], tree: PartitionTree,
    conf: org.apache.hadoop.conf.Configuration) extends DataWriter[InternalRow] {

  import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}

  private val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
  private val st = StructType(tableFields.map(f =>
    org.apache.spark.sql.types.StructField(f.name, f.dataType, f.nullable)))
  private val keyIdx = keyNames.map(n => tableFields.indexWhere(_.name == n)).toArray
  private val rowKeyIdx = rowKeyNames.map(n => tableFields.indexWhere(_.name == n)).toArray

  private val proj = UnsafeProjection.create(st)
  private val spillThreshold = GraftSinkWriter.spillBytes
  private var bufferedBytes = 0L
  private val spills = scala.collection.mutable.ArrayBuffer.empty[java.io.File]

  override def write(record: InternalRow): Unit = {
    val u = proj(record).copy()
    rows += u
    bufferedBytes += u.getSizeInBytes
    if (bufferedBytes >= spillThreshold) spill()
  }

  /** Spill the buffer as one key-sorted run of length-prefixed
    * UnsafeRows on local disk; commit() merges every run back.
    */
  private def spill(): Unit = {
    val sorted = rows.sorted(keyOrd)
    val f = java.io.File.createTempFile("graft-sink-spill-", ".run")
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f), 1 << 16))
    val writeBuffer = new Array[Byte](4096)
    try sorted.foreach { r =>
      val u = r.asInstanceOf[UnsafeRow]
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, writeBuffer)
    } finally out.close()
    spills += f
    rows.clear()
    bufferedBytes = 0L
  }

  private def readSpill(f: java.io.File): Iterator[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(f), 1 << 16))
    new Iterator[InternalRow] {
      private var nextLen = readLen()
      private def readLen(): Int =
        try in.readInt()
        catch { case _: java.io.EOFException => in.close(); -1 }
      override def hasNext: Boolean = nextLen >= 0
      override def next(): InternalRow = {
        val bytes = new Array[Byte](nextLen)
        in.readFully(bytes)
        val u = new UnsafeRow(st.length)
        u.pointTo(bytes, nextLen)
        nextLen = readLen()
        u
      }
    }
  }

  /** N-way merge of key-sorted iterators (the buffer + the spilled
    * runs) — O(#runs) heap, streaming.
    */
  private def mergeSorted(iters: Seq[Iterator[InternalRow]]): Iterator[InternalRow] = {
    val pq = new java.util.PriorityQueue[(InternalRow, Iterator[InternalRow])](
      math.max(iters.size, 1),
      (a: (InternalRow, Iterator[InternalRow]), b: (InternalRow, Iterator[InternalRow])) =>
        keyOrd.compare(a._1, b._1))
    iters.foreach(it => if (it.hasNext) pq.add((it.next(), it)))
    new Iterator[InternalRow] {
      override def hasNext: Boolean = !pq.isEmpty
      override def next(): InternalRow = {
        val (r, it) = pq.poll()
        if (it.hasNext) pq.add((it.next(), it))
        r
      }
    }
  }

  /** Key value in driver-comparable form (UTF8String → String, so
    * KeyOrdering and PartitionTree.leafFor see the split-point types).
    */
  private def keyVal(row: InternalRow, i: Int): Any =
    row.get(i, tableFields(i).dataType) match {
      case u: UTF8String => u.toString
      case v => v
    }

  private val keyOrd: Ordering[InternalRow] = new Ordering[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = {
      var i = 0
      while (i < keyIdx.length) {
        val c = KeyOrdering.compare(keyVal(a, keyIdx(i)), keyVal(b, keyIdx(i)))
        if (c != 0) return c
        i += 1
      }
      0
    }
  }

  override def commit(): WriterCommitMessage = {
    if (rows.isEmpty && spills.isEmpty) return GraftSinkFile("", "", Map.empty)
    val merged: Iterator[InternalRow] =
      if (spills.isEmpty) rows.sorted(keyOrd).iterator
      else mergeSorted(rows.sorted(keyOrd).iterator +: spills.toSeq.map(readSpill))
    val home = tree.root.id
    val name = s"stream-${java.util.UUID.randomUUID().toString.take(12)}.parquet"
    val path = s"$dir/data/$home/$name"
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    val writer = DeltaSpool.open(path, st, conf)
    try merged.foreach { r =>
      writer.write(r)
      val leaf = tree.leafFor(rowKeyIdx.map(i => keyVal(r, i)).toSeq).id
      counts(leaf) = counts.getOrElse(leaf, 0L) + 1L
    } finally {
      writer.close()
      dropSpills()
    }
    GraftSinkFile(name, home, counts.toMap)
  }

  private def dropSpills(): Unit = {
    spills.foreach(f => try f.delete() catch { case scala.util.control.NonFatal(_) => () })
    spills.clear()
  }

  override def abort(): Unit = dropSpills()
  override def close(): Unit = { rows.clear(); dropSpills() }
}
