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
  *    home. Plain CTAS is ONE rename — fully atomic. RTAS needs two
  *    (old aside, then staged in), so a crash between them can leave the
  *    name briefly unbound; a durable publish MARKER written before the
  *    first rename makes that window recoverable: the next catalog
  *    resolution of the name ([[GraftCatalog.loadTable]]) finds the
  *    marker and completes the publish (staged had all its data) or
  *    restores the old directory from `.staging/trash-*`. A reader that
  *    already resolved the old snapshot keeps reading its files until
  *    the trash is deleted; a new resolution sees old-or-new (after at
  *    most one recovery step), never a partial table.
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
    if (!priorExists) {
      // CTAS: publication is one rename — atomic, no marker needed
      if (dst.getParent != null) fs.mkdirs(dst.getParent)
      GraftFS.rename(src, dst, fs)
      return
    }
    // RTAS: two renames. The marker (written BEFORE touching the old
    // directory) records the three paths so a crash anywhere in the
    // sequence is recoverable by GraftCatalog.recoverPublish.
    val uuid = java.util.UUID.randomUUID().toString
    val trash = new org.apache.hadoop.fs.Path(s"$root/.staging/trash-$uuid")
    val marker = s"$root/.staging/publish-$uuid.marker"
    GraftFS.writeBytes(marker,
      s"$stagedDir\n$finalDir\n$trash\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    GraftFS.rename(dst, trash, fs)
    if (dst.getParent != null) fs.mkdirs(dst.getParent)
    try GraftFS.rename(src, dst, fs)
    catch { case e: Throwable =>
      // put the old table back before surfacing the failure
      GraftFS.rename(trash, dst, fs)
      fs.delete(new org.apache.hadoop.fs.Path(marker), false)
      throw e
    }
    fs.delete(trash, true)
    fs.delete(new org.apache.hadoop.fs.Path(marker), false)
  }

  override def abortStagedChanges(): Unit =
    GraftFS.deleteRecursive(stagedDir)
}
