package graft.sources

import java.util.{Collections, Iterator => JIterator}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.table.GraftTable
import graft.jobs.{BasicCompactionStrategy, MetricsPublisher, SizeRatioCompactionStrategy}

/** SQL stored procedures for table administration — the pure-SQL
  * counterpart of the reference's clients/admin command set
  * (reference: java/clients/src/main/java/sleeper/clients/admin/,
  * java/compaction/, java/garbage-collector/). A SQL-only operator runs
  * the whole maintenance loop without touching the Scala API:
  *
  *   CALL g.system.compact('events', strategy => 'size_ratio')
  *   CALL g.system.split_partitions('events')
  *   CALL g.system.gc('events')
  *   CALL g.system.snapshot_metrics('events', 'ops.metrics')
  *   CALL g.system.restore('events', 3)
  *
  * Implemented on Spark 4's ProcedureCatalog/BoundProcedure contract:
  * each call returns a single [[LocalScan]] of summary rows (counts and
  * ids — O(metadata), never data rows), so results compose with normal
  * SQL (`CALL` yields a DataFrame). Side effects go through the exact
  * same GraftTable jobs the API and CLI use — one code path, three
  * surfaces.
  */
object GraftProcedures {

  /** All procedures live in the `system` namespace (or unqualified). */
  val Names: Seq[String] =
    Seq("compact", "split_partitions", "gc", "snapshot_metrics", "restore",
      "clone", "sync_index", "vacuum_index", "index_stats")

  def load(root: String, ident: Identifier): UnboundProcedure = {
    val ns = ident.namespace.toSeq
    require(ns.isEmpty || ns == Seq("system"),
      s"no such procedure namespace: ${ns.mkString(".")}")
    ident.name.toLowerCase match {
      case "compact"          => new CompactProc(root)
      case "split_partitions" => new SplitProc(root)
      case "gc"               => new GcProc(root)
      case "snapshot_metrics" => new SnapshotMetricsProc(root)
      case "restore"          => new RestoreProc(root)
      case "clone"            => new CloneProc(root)
      case "sync_index"       => new SyncIndexProc(root)
      case "vacuum_index"     => new VacuumIndexProc
      case "index_stats"      => new IndexStatsProc
      case other => throw new IllegalArgumentException(s"no such procedure: $other")
    }
  }

  /** Resolve a table name ('tbl' or 'ns.tbl') under the catalog root. */
  private def open(root: String, table: String): GraftTable =
    GraftTable.load(SparkSession.active, (root +: table.split('.').toSeq).mkString("/"))

  private def utf8(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case x => x
  }

  private final class ResultScan(val readSchema: StructType, data: Seq[Seq[Any]])
      extends LocalScan {
    override def rows(): Array[InternalRow] =
      data.map(r => InternalRow.fromSeq(r.map(utf8))).toArray
  }

  private def result(schema: StructType, data: Seq[Seq[Any]]): JIterator[Scan] =
    Collections.singletonList[Scan](new ResultScan(schema, data)).iterator()

  private abstract class Proc(val name: String) extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    protected def in(n: String, t: DataType): ProcedureParameter =
      ProcedureParameter.in(n, t).build()
    protected def inDefault(n: String, t: DataType, sqlDefault: String): ProcedureParameter =
      ProcedureParameter.in(n, t).defaultValue(sqlDefault).build()
  }

  /** compact(table, strategy='all'): run a compaction pass; 'all'
    * merges every multi-file leaf, 'basic'/'size_ratio' run the
    * corresponding strategy planner. Returns (jobs, files_before,
    * files_after).
    */
  private final class CompactProc(root: String) extends Proc("compact") {
    override def description: String = "merge sorted run files leaf by leaf"
    override def parameters: Array[ProcedureParameter] = Array(
      in("table", StringType), inDefault("strategy", StringType, "'all'"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = open(root, input.getUTF8String(0).toString)
      val before = t.store.fileReferences.size
      val jobs = input.getUTF8String(1).toString.toLowerCase match {
        case "all" =>
          val n = t.store.fileReferences.groupBy(_.partitionId).count(_._2.size > 1)
          t.compactAll(); n
        case "basic"      => t.compact(BasicCompactionStrategy())
        case "size_ratio" => t.compact(SizeRatioCompactionStrategy())
        case other => throw new IllegalArgumentException(
          s"unknown compaction strategy '$other' (all|basic|size_ratio)")
      }
      val after = GraftTable.load(t.spark, t.dir).store.fileReferences.size
      result(StructType(Seq(StructField("jobs", IntegerType),
        StructField("files_before", IntegerType), StructField("files_after", IntegerType))),
        Seq(Seq(jobs, before, after)))
    }
  }

  /** split_partitions(table): split every leaf past the size threshold
    * at its sketch median. Returns one row per split leaf.
    */
  private final class SplitProc(root: String) extends Proc("split_partitions") {
    override def description: String = "split oversized leaves at the quantile-sketch median"
    override def parameters: Array[ProcedureParameter] = Array(in("table", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val split = open(root, input.getUTF8String(0).toString).splitPartitions()
      result(StructType(Seq(StructField("partition_id", StringType))), split.map(Seq(_)))
    }
  }

  /** gc(table): delete unreferenced data files past the retention
    * window. Returns (deleted_files,).
    */
  private final class GcProc(root: String) extends Proc("gc") {
    override def description: String = "delete unreferenced data files"
    override def parameters: Array[ProcedureParameter] = Array(in("table", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val deleted = open(root, input.getUTF8String(0).toString).collectGarbage()
      result(StructType(Seq(StructField("deleted_files", IntegerType))),
        Seq(Seq(deleted.size)))
    }
  }

  /** snapshot_metrics(table, sink): append one TableMetrics snapshot
    * for `table` into the metrics table `sink` (created on first use),
    * and return it. O(state store) — reads zero data files.
    */
  private final class SnapshotMetricsProc(root: String) extends Proc("snapshot_metrics") {
    override def description: String = "record a TableMetrics snapshot into a metrics table"
    override def parameters: Array[ProcedureParameter] = Array(
      in("table", StringType), in("sink", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val name = input.getUTF8String(0).toString
      val src = open(root, name)
      val sinkDir = (root +: input.getUTF8String(1).toString.split('.').toSeq).mkString("/")
      val sink =
        if (graft.meta.GraftFS.exists(s"$sinkDir/meta")) GraftTable.load(src.spark, sinkDir)
        else MetricsPublisher.createTable(src.spark, sinkDir)
      MetricsPublisher.publish(src, sink, name)
      val m = src.metrics
      result(StructType(Seq(StructField("table_name", StringType),
        StructField("row_count", LongType), StructField("file_count", LongType),
        StructField("leaf_partition_count", LongType))),
        Seq(Seq(name, m.rowCount, m.fileCount.toLong, m.leafPartitionCount.toLong)))
    }
  }

  /** sync_index(table, index_dir, id_col, vec_col, pq=false): reconcile
    * a persisted IVF(-PQ) index with its base table's DELETEs/UPSERTs
    * via the CDC feeds ([[graft.vectors.VectorFunctions.syncIndexWithTable]]).
    * `index_dir` is a filesystem path (indexes are build artifacts, not
    * catalog objects). Returns (synced_version,).
    */
  private final class SyncIndexProc(root: String) extends Proc("sync_index") {
    override def description: String =
      "reconcile a persisted ANN index with its base table's change feed"
    override def parameters: Array[ProcedureParameter] = Array(
      in("table", StringType), in("index_dir", StringType),
      in("id_col", StringType), in("vec_col", StringType),
      inDefault("pq", BooleanType, "false"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = open(root, input.getUTF8String(0).toString)
      val v = graft.vectors.VectorFunctions.syncIndexWithTable(
        t, input.getUTF8String(2).toString, input.getUTF8String(3).toString,
        input.getUTF8String(1).toString, pq = input.getBoolean(4))
      result(StructType(Seq(StructField("synced_version", LongType))), Seq(Seq(v)))
    }
  }

  /** vacuum_index(index_dir): physically rewrite a persisted index's
    * inverted lists to live-only rows and clear its tombstone sidecar.
    * Returns (live_rows,).
    */
  private final class VacuumIndexProc extends Proc("vacuum_index") {
    override def description: String =
      "rewrite a persisted ANN index live-only, clearing tombstones"
    override def parameters: Array[ProcedureParameter] =
      Array(in("index_dir", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val live = graft.vectors.VectorFunctions.vacuumIndex(
        SparkSession.active, input.getUTF8String(0).toString)
      result(StructType(Seq(StructField("live_rows", LongType))), Seq(Seq(live)))
    }
  }

  /** index_stats(index_dir): occupancy/health of a persisted index —
    * the numbers the maintenance loop triggers on (needsRetrain on
    * skew, needsVacuum on dead fraction).
    */
  private final class IndexStatsProc extends Proc("index_stats") {
    override def description: String =
      "occupancy and tombstone health of a persisted ANN index"
    override def parameters: Array[ProcedureParameter] =
      Array(in("index_dir", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val s = graft.vectors.VectorFunctions.ivfIndexStats(
        SparkSession.active, input.getUTF8String(0).toString)
      result(StructType(Seq(StructField("cells", IntegerType),
        StructField("live_rows", LongType), StructField("dead_rows", LongType),
        StructField("skew", DoubleType), StructField("needs_retrain", BooleanType),
        StructField("needs_vacuum", BooleanType))),
        Seq(Seq(s.cells, s.totalVectors, s.deadRows, s.skew,
          s.needsRetrain(), s.needsVacuum())))
    }
  }

  /** clone(source, dest, version=-1, shallow=true): branch `source` at a
    * state version (-1 = current) into the new catalog table `dest`.
    * Shallow = zero-copy (O(metadata): the clone references the source's
    * files by absolute path — branching 100 TB is one state-store
    * write); shallow=false byte-copies data+sidecars for full lifecycle
    * independence. Returns (dest, version, files, shallow).
    */
  private final class CloneProc(root: String) extends Proc("clone") {
    override def description: String = "branch a table at a version (zero-copy by default)"
    override def parameters: Array[ProcedureParameter] = Array(
      in("source", StringType), in("dest", StringType),
      inDefault("version", LongType, "-1"),
      inDefault("shallow", BooleanType, "true"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val src = open(root, input.getUTF8String(0).toString)
      val destName = input.getUTF8String(1).toString
      val destDir = (root +: destName.split('.').toSeq).mkString("/")
      if (graft.meta.GraftFS.exists(s"$destDir/meta"))
        throw new IllegalArgumentException(s"table already exists: $destName")
      val v = input.getLong(2) match {
        case -1L => src.store match {
          case s: graft.meta.JsonStateStore => s.currentVersion
          case _ => throw new IllegalArgumentException("pass an explicit version")
        }
        case other => other
      }
      val cloned =
        if (input.getBoolean(3)) src.shallowCloneAt(destDir, v)
        else src.cloneAt(destDir, v)
      result(StructType(Seq(StructField("dest", StringType),
        StructField("version", LongType), StructField("files", IntegerType),
        StructField("shallow", BooleanType))),
        Seq(Seq(destName, v, cloned.store.fileReferences.size, input.getBoolean(3))))
    }
  }

  /** restore(table, version): roll the table state back to `version`
    * as a NEW commit (history is preserved; see GraftTable.restoreTo).
    */
  private final class RestoreProc(root: String) extends Proc("restore") {
    override def description: String = "restore table state to a historical version"
    override def parameters: Array[ProcedureParameter] = Array(
      in("table", StringType), in("version", LongType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = open(root, input.getUTF8String(0).toString)
      val v = input.getLong(1)
      t.restoreTo(v)
      result(StructType(Seq(StructField("restored_to", LongType))), Seq(Seq(v)))
    }
  }
}
