package graft.sources

import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsRead, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.meta.GraftFS

/** A CTAS/RTAS table under construction (StagingTableCatalog contract;
  * the Delta/Iceberg staged-commit shape — reference table lifecycle:
  * java/core/src/main/java/sleeper/core/statestore/ has no CTAS, this is
  * catalog-surface superset).
  *
  * The staged table IS a complete graft table living in a hidden
  * `.staging` scratch home — Spark's atomic CTAS exec writes the SELECT's
  * rows into it through the exact normal write path (sorted shared files,
  * sketch sidecars, one AddFiles version), so nothing about the data
  * layout is special-cased. Publication is the last step:
  *
  *  - commitStagedChanges(): move the finished directory to its catalog
  *    home. For RTAS the previous table directory is moved aside first
  *    and deleted only after the swap (a reader that already resolved the
  *    old snapshot keeps reading its files until then; a new resolution
  *    sees old-or-new, never a partial table).
  *  - abortStagedChanges(): delete the scratch home; the catalog
  *    namespace never saw the name.
  */
final class GraftStagedTable(stagedDir: String, finalDir: String,
    root: String, replaceExisting: Boolean)
    extends StagedTable with SupportsRead with SupportsWrite {

  private val inner = new GraftBatchTable(stagedDir)

  override def name(): String = inner.name()
  override def schema(): StructType = inner.schema()
  override def capabilities(): java.util.Set[TableCapability] = inner.capabilities()
  override def properties(): java.util.Map[String, String] = inner.properties()
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    inner.newScanBuilder(options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    inner.newWriteBuilder(info)

  override def commitStagedChanges(): Unit = {
    val (fs, src) = GraftFS.resolve(stagedDir)
    val dst = new org.apache.hadoop.fs.Path(finalDir)
    val priorExists = fs.exists(dst)
    if (priorExists && !replaceExisting)
      throw new IllegalStateException(
        s"table appeared at $finalDir while the CTAS was running")
    val trash = new org.apache.hadoop.fs.Path(
      s"$root/.staging/trash-${java.util.UUID.randomUUID()}")
    if (priorExists) GraftFS.rename(dst, trash, fs)
    if (dst.getParent != null) fs.mkdirs(dst.getParent)
    try GraftFS.rename(src, dst, fs)
    catch { case e: Throwable =>
      // put the old table back before surfacing the failure
      if (priorExists) GraftFS.rename(trash, dst, fs)
      throw e
    }
    if (priorExists) fs.delete(trash, true)
  }

  override def abortStagedChanges(): Unit =
    GraftFS.deleteRecursive(stagedDir)
}
