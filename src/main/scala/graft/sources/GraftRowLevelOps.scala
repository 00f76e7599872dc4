package graft.sources

import java.util.UUID
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.expressions.{Expression => VExpr, Expressions, Literal => VLiteral, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{And => VAnd, Or => VOr, Predicate}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.core.GraftSchema
import graft.meta.{GraftFS, JsonStateStore, SerializableHadoopConf}

/** SQL row-level DML for graft tables — `DELETE FROM` / `UPDATE` /
  * `MERGE INTO` through the Spark catalog, landing on the engine's
  * existing LSM primitives:
  *
  *  - deletes become generation-aware row-key tombstones (m13/m15) —
  *    O(keys) IO, zero data rewrite;
  *  - updates are split by Spark into delete+reinsert
  *    (`representUpdateAsDeleteAndInsert`), which the single atomic
  *    merge commit resolves correctly because delete markers stamp one
  *    generation below the same commit's puts (m16);
  *  - the whole statement commits as ONE `commitMerge` transaction —
  *    no reader ever observes half a MERGE.
  *
  * This is the merge-on-read (delta-based) flavor of Spark's row-level
  * API (`SupportsDelta`): the statement's cost is O(matched + source)
  * rows spooled and one metadata commit — never a copy-on-write rewrite
  * of the touched files. Executors spool their share of the delta as
  * parquet (puts with the full schema, deletes as bare key tuples);
  * the driver folds the spool through the normal ingest/tombstone
  * dataflows, so sorting, leaf partitioning, sketches, stats and bloom
  * sidecars all apply to SQL-written data exactly as to API writes.
  */
object GraftRowLevelOps {

  /** Row-key tuples from pushed DELETE predicates, when the WHERE is an
    * exact-key shape: `k = v`, `k IN (...)` (single-key tables), an AND
    * of `=` covering every row key, or an OR of such conjunctions.
    * These delete METADATA-ONLY via tombstones — no scan at all. Any
    * other shape returns None and takes the scan-based row-level path.
    */
  def keyTuples(schema: GraftSchema, preds: Array[Predicate]): Option[Seq[Seq[Any]]] = {
    val keys = schema.rowKeys
    def colName(e: VExpr): Option[String] = e match {
      case n: NamedReference if n.fieldNames.length == 1 => Some(n.fieldNames()(0))
      case _ => None
    }
    def litValue(e: VExpr, dt: DataType): Option[Any] = e match {
      case l: VLiteral[_] if DataType.equalsIgnoreNullability(l.dataType, dt) =>
        Option(CatalystTypeConverters.convertToScala(l.value, l.dataType))
      case _ => None
    }
    def flattenAnd(p: Predicate): Seq[Predicate] = p match {
      case a: VAnd => flattenAnd(a.left) ++ flattenAnd(a.right)
      case _ => Seq(p)
    }
    def flattenOr(p: Predicate): Seq[Predicate] = p match {
      case o: VOr => flattenOr(o.left) ++ flattenOr(o.right)
      case _ => Seq(p)
    }
    def eqPair(p: Predicate): Option[(String, Any)] =
      if (p.name != "=") None
      else p.children match {
        case Array(c, l) =>
          for {
            n <- colName(c)
            f <- keys.find(_.name == n)
            v <- litValue(l, f.dataType)
          } yield n -> v
        case _ => None
      }
    def conj(ps: Seq[Predicate]): Option[Seq[Any]] = {
      val pairs = ps.map(eqPair)
      if (ps.isEmpty || pairs.exists(_.isEmpty)) None
      else {
        val flat = pairs.flatten
        val m = flat.toMap
        if (flat.size == m.size && m.keySet == keys.map(_.name).toSet)
          Some(keys.map(k => m(k.name)))
        else None
      }
    }
    def one(p: Predicate): Option[Seq[Seq[Any]]] = p match {
      case _: VOr =>
        val branches = flattenOr(p).map(b => conj(flattenAnd(b)))
        if (branches.forall(_.isDefined)) Some(branches.map(_.get)) else None
      case _ if p.name == "IN" && keys.size == 1 =>
        val f = keys.head
        p.children.toSeq match {
          case c +: lits if colName(c).contains(f.name) && lits.nonEmpty =>
            val vs = lits.map(l => litValue(l, f.dataType))
            if (vs.forall(_.isDefined)) Some(vs.map(v => Seq(v.get))) else None
          case _ => None
        }
      case _ => conj(flattenAnd(p)).map(Seq(_))
    }
    preds.toSeq match {
      case Seq(p) => one(p)
      case many if many.nonEmpty => conj(many.flatMap(flattenAnd)).map(Seq(_))
      case _ => None
    }
  }

  def keyStruct(schema: GraftSchema): StructType =
    StructType(schema.rowKeys.map(f => StructField(f.name, f.dataType, nullable = false)))

  /** Row-level DML targets a row by its row key, so the row key must
    * identify exactly one logical row: an aggregation-configured table
    * with no sort keys. On anything else a tombstone would silently take
    * sibling rows with it; refuse with a pointer to the API contract.
    */
  def assertRowLevelCapable(dir: String, schema: GraftSchema, aggregationConfig: String): Unit = {
    require(schema.sortKeys.isEmpty && aggregationConfig.trim.nonEmpty,
      s"table at $dir does not support row-level SQL DML: deletes target whole " +
        "row keys, so the table must resolve to one row per key (an aggregation " +
        "config such as last(...)) and have no sort keys. Exact-key DELETE " +
        "(WHERE key = ... / IN ...) works on any table; for everything else use " +
        "GraftTable.deleteKeys/merge, whose by-key semantics are explicit")
  }
}

/** One SQL DELETE/UPDATE/MERGE statement against a graft table. */
final class GraftRowLevelOperation(
    dir: String,
    schema: GraftSchema,
    aggregationConfig: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String = s"graft row-level $cmd on $dir"

  // the statement's read of the target: the normal DSv2 merge-read path
  // (LWW resolution + pending tombstones applied), so matching sees the
  // table exactly as SELECT does
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(dir, JsonStateStore.load(s"$dir/meta"))

  override def rowId(): Array[NamedReference] =
    schema.rowKeyNames.map(Expressions.column).toArray

  // LSM semantics make delete+reinsert the native update shape: the
  // delete marker lands one generation below the put in the same commit
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder = {
    // reached only by scan-based DML (exact-key DELETEs were optimized
    // into the metadata-only path before any write is built)
    GraftRowLevelOps.assertRowLevelCapable(dir, schema, aggregationConfig)
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new GraftDeltaWrite(dir, schema)
    }
  }
}

final class GraftDeltaWrite(dir: String, schema: GraftSchema) extends DeltaWrite {
  override def toBatch: DeltaBatchWrite = new GraftDeltaBatchWrite(dir, schema)
  override def description(): String = s"graft delta write to $dir"
}

final case class GraftDeltaMessage(putFile: Option[String], delFile: Option[String])
  extends WriterCommitMessage

/** Spool-then-commit: executors write their delta share as parquet under
  * `<table>/.dml-<id>/`; the driver folds the spool through the normal
  * tombstone + ingest dataflows and commits both file sets as ONE
  * atomic merge transaction (puts one generation above the markers).
  */
final class GraftDeltaBatchWrite(dir: String, schema: GraftSchema) extends DeltaBatchWrite {

  private val spoolDir = s"$dir/.dml-${UUID.randomUUID().toString.take(8)}"
  private val putSt = StructType(schema.toStructType.fields.map(_.copy(nullable = true)))
  private val keySt = GraftRowLevelOps.keyStruct(schema)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftDeltaWriterFactory(spoolDir, putSt, keySt, GraftFS.serializableConf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    try {
      val msgs = messages.collect { case m: GraftDeltaMessage => m }
      val putFiles = msgs.flatMap(_.putFile).toSeq
      val delFiles = msgs.flatMap(_.delFile).toSeq
      if (putFiles.isEmpty && delFiles.isEmpty) return
      val table = graft.table.GraftTable.load(spark, dir)
      val tombRefs =
        if (delFiles.isEmpty) Nil
        else graft.jobs.Tombstones.write(table,
          spark.read.schema(keySt).parquet(delFiles: _*), commit = false)
      val putRefs =
        if (putFiles.isEmpty) Nil
        else new graft.jobs.Ingest(table).run(
          spark.read.schema(putSt).parquet(putFiles: _*), commit = false)
      if (tombRefs.nonEmpty || putRefs.nonEmpty)
        table.store.commitMerge(putRefs, tombRefs)
    } finally cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit =
    try GraftFS.deleteRecursive(spoolDir)
    catch { case scala.util.control.NonFatal(_) => () }
}

final class GraftDeltaWriterFactory(
    spoolDir: String,
    putSt: StructType,
    keySt: StructType,
    conf: SerializableHadoopConf) extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(spoolDir, putSt, keySt, conf, partitionId, taskId)
}

final class GraftDeltaWriter(
    spoolDir: String,
    putSt: StructType,
    keySt: StructType,
    conf: SerializableHadoopConf,
    partitionId: Int,
    taskId: Long) extends DeltaWriter[InternalRow] {

  private val putPath = s"$spoolDir/puts-$partitionId-$taskId.parquet"
  private val delPath = s"$spoolDir/dels-$partitionId-$taskId.parquet"
  private var putW: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _
  private var delW: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _

  private def puts() = {
    if (putW == null) putW = DeltaSpool.open(putPath, putSt, conf.value)
    putW
  }
  private def dels() = {
    if (delW == null) delW = DeltaSpool.open(delPath, keySt, conf.value)
    delW
  }

  override def insert(row: InternalRow): Unit = puts().write(row)
  override def reinsert(metadata: InternalRow, row: InternalRow): Unit = puts().write(row)
  override def delete(metadata: InternalRow, id: InternalRow): Unit = dels().write(id)
  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    dels().write(id); puts().write(row)
  }

  override def commit(): WriterCommitMessage = {
    val msg = GraftDeltaMessage(
      if (putW != null) Some(putPath) else None,
      if (delW != null) Some(delPath) else None)
    close()
    msg
  }

  override def abort(): Unit = {
    close()
    val c = conf.value
    Seq(putPath, delPath).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      try hp.getFileSystem(c).delete(hp, false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  override def close(): Unit = {
    if (putW != null) { putW.close(); putW = null }
    if (delW != null) { delW.close(); delW = null }
  }
}
