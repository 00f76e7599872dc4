package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.JsonStateStore

/** Iceberg-style SQL metadata tables, resolved by [[GraftCatalog]] from
  * a `$`-suffixed identifier (reference counterpart: the clients/report
  * status surface — here queryable relations instead of text):
  *
  *   SELECT * FROM g.`events$files`       -- live file references
  *   SELECT * FROM g.`events$partitions`  -- leaf/inner partition stats
  *   SELECT * FROM g.`events$tombstones`  -- pending row-key deletes
  *   SELECT * FROM g.`events$history`     -- retained versions + commit times
  *
  * All are METADATA-ONLY: rows come from one state-store load (plus, for
  * `$history`, one directory listing) — zero data IO at any table size,
  * served through a [[LocalScan]] (driver-local rows; the state is
  * O(files), the same thing the planner itself holds). `$history` is the
  * discovery surface for `VERSION AS OF` / `TIMESTAMP AS OF`.
  */
final class GraftMetadataTable(dir: String, kind: String)
    extends Table with SupportsRead {

  import GraftMetadataTable._

  require(Kinds.contains(kind),
    s"unknown metadata table '$$${kind}' (expected one of ${Kinds.mkString(", ")})")

  override def name(): String = s"graft.`$dir`$$$kind"

  override def schema(): StructType = kind match {
    case "files" | "tombstones" => new StructType()
      .add("partition_id", StringType, nullable = false)
      .add("filename", StringType, nullable = false)
      .add("row_count", LongType, nullable = false)
      .add("seq", LongType, nullable = false)
      .add("data_change", BooleanType, nullable = false)
      .add("job_id", StringType, nullable = true)
      .add("home", StringType, nullable = false)
    case "partitions" => new StructType()
      .add("id", StringType, nullable = false)
      .add("is_leaf", BooleanType, nullable = false)
      .add("file_count", LongType, nullable = false)
      .add("row_estimate", LongType, nullable = false)
      .add("tombstone_count", LongType, nullable = false)
    case "history" => new StructType()
      .add("version", LongType, nullable = false)
      .add("committed_at", TimestampType, nullable = false)
      .add("operation", StringType, nullable = false)
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val st = schema()
    () => new LocalScan {
      override def readSchema(): StructType = st
      override def rows(): Array[InternalRow] = computeRows(dir, kind)
      override def description(): String = name()
    }
  }
}

object GraftMetadataTable {

  val Kinds: Set[String] = Set("files", "partitions", "tombstones", "history")

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private def computeRows(dir: String, kind: String): Array[InternalRow] = {
    val meta = s"$dir/meta"
    kind match {
      case "files" | "tombstones" =>
        val store = JsonStateStore.load(meta)
        val refs = if (kind == "files") store.fileReferences else store.tombstones
        refs.sortBy(r => (r.partitionId, r.filename)).map { r =>
          new GenericInternalRow(Array[Any](
            utf8(r.partitionId), utf8(r.filename), r.rowCount, r.seq,
            r.dataChange, r.jobId.map(utf8).orNull, utf8(r.physicalPartitionId)))
        }.toArray
      case "partitions" =>
        val store = JsonStateStore.load(meta)
        val files = store.fileReferences.groupBy(_.partitionId)
        val tombs = store.tombstones.groupBy(_.partitionId)
        store.partitionTree.partitions.sortBy(_.id).map { p =>
          val fs = files.getOrElse(p.id, Nil)
          new GenericInternalRow(Array[Any](
            utf8(p.id), p.isLeaf, fs.size.toLong, fs.map(_.rowCount).sum,
            tombs.get(p.id).fold(0L)(_.size.toLong)))
        }.toArray
      case "history" =>
        JsonStateStore.retainedVersionsIn(meta).map { case (v, ms) =>
          new GenericInternalRow(Array[Any](v, ms * 1000L, // micros
            utf8(JsonStateStore.operationAt(meta, v))))
        }.toArray
    }
  }
}
