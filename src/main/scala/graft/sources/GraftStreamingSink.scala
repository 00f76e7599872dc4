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
final class GraftStreamingWrite(dir: String, queryId: String,
    tableFields: Seq[GraftField], keyNames: Seq[String], rowKeyNames: Seq[String],
    tree: PartitionTree) extends StreamingWrite {

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

final case class GraftSinkFile(name: String, home: String,
    counts: Map[String, Long]) extends WriterCommitMessage

final case class GraftSinkWriterFactory(dir: String, tableFields: Seq[GraftField],
    keyNames: Seq[String], rowKeyNames: Seq[String], tree: PartitionTree,
    conf: SerializableHadoopConf) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftSinkWriter(dir, tableFields, keyNames, rowKeyNames, tree, conf.value)
}

/** Buffers one task's micro-batch partition, sorts by key order, writes
  * one root-homed shared file with exact per-leaf counts.
  */
final class GraftSinkWriter(dir: String, tableFields: Seq[GraftField],
    keyNames: Seq[String], rowKeyNames: Seq[String], tree: PartitionTree,
    conf: org.apache.hadoop.conf.Configuration) extends DataWriter[InternalRow] {

  private val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
  private val st = StructType(tableFields.map(f =>
    org.apache.spark.sql.types.StructField(f.name, f.dataType, f.nullable)))
  private val keyIdx = keyNames.map(n => tableFields.indexWhere(_.name == n)).toArray
  private val rowKeyIdx = rowKeyNames.map(n => tableFields.indexWhere(_.name == n)).toArray

  override def write(record: InternalRow): Unit = rows += record.copy()

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
    if (rows.isEmpty) return GraftSinkFile("", "", Map.empty)
    val sorted = rows.sorted(keyOrd)
    val home = tree.root.id
    val name = s"stream-${java.util.UUID.randomUUID().toString.take(12)}.parquet"
    val path = s"$dir/data/$home/$name"
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    val writer = DeltaSpool.open(path, st, conf)
    try sorted.foreach { r =>
      writer.write(r)
      val leaf = tree.leafFor(rowKeyIdx.map(i => keyVal(r, i)).toSeq).id
      counts(leaf) = counts.getOrElse(leaf, 0L) + 1L
    } finally writer.close()
    GraftSinkFile(name, home, counts.toMap)
  }

  override def abort(): Unit = ()
  override def close(): Unit = rows.clear()
}
