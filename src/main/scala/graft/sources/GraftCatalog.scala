package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, StagedTable, StagingTableCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.core.{GraftField, GraftSchema, PartitionTree}
import graft.meta.{GraftFS, JsonStateStore}

/** Spark TableCatalog over a directory of graft tables, enabling a
  * pure-SQL workflow end to end:
  *
  *   spark.sql.catalog.g       = graft.sources.GraftCatalog
  *   spark.sql.catalog.g.root  = /base/dir
  *
  *   CREATE TABLE g.events (key STRING, ts BIGINT, count BIGINT)
  *     USING graft
  *     TBLPROPERTIES('rowKeys'='key', 'sortKeys'='ts',
  *                   'splitPoints'='m', 'aggregation'='sum(count)')
  *   INSERT INTO g.events SELECT ...   -- full ingest dataflow
  *   SELECT ... FROM g.events WHERE key BETWEEN 'a' AND 'c'  -- pushdown
  *
  * Table layout on disk is identical to GraftTable.create, so catalog
  * tables and API tables are interchangeable. Key designation rides in
  * TBLPROPERTIES because SQL DDL has no key-column syntax: 'rowKeys'
  * (required) and 'sortKeys' are comma-separated column lists; remaining
  * columns become value fields. 'splitPoints' seeds the partition tree
  * (typed by the first row key); 'aggregation'/'filter'/'transform' set
  * the persistent table config.
  */
final class GraftCatalog extends TableCatalog with ProcedureCatalog
    with StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"set spark.sql.catalog.$name.root to the catalog's base directory"))
  }

  override def name(): String = catalogName

  // Stored procedures (CALL cat.system.compact('t'), ...) — see
  // GraftProcedures for the set and their result schemas.
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.load(root, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.toSeq == Seq("system"))
      GraftProcedures.Names.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  /** FunctionCatalog: serves the storage-partitioned-join transform
    * functions `graft_leaf_<fingerprint>` that [[GraftScan]] reports in
    * its `KeyGroupedPartitioning` (see [[GraftPartitioning]]). Spark's
    * `V2ScanPartitioningAndOrdering` rule resolves the transform through
    * the relation's catalog right after the scan registers the
    * fingerprint, so lookups hit the same-JVM registry.
    */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction = {
    val n = ident.name
    if (ident.namespace.isEmpty && n.startsWith(GraftPartitioning.FunctionPrefix))
      GraftPartitioning.lookup(n.substring(GraftPartitioning.FunctionPrefix.length))
        .map(loc => new GraftLeafUnbound(n, loc))
        .getOrElse(throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident))
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
  }

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array.empty

  private def dirFor(ident: Identifier): String =
    (root +: ident.namespace.toSeq :+ ident.name).mkString("/")

  override def tableExists(ident: Identifier): Boolean =
    GraftFS.exists(s"${dirFor(ident)}/meta")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = (root +: namespace.toSeq).mkString("/")
    val (fs, _) = GraftFS.resolve(dir)
    GraftFS.list(dir)
      .filter(d => d.isDirectory && fs.exists(new org.apache.hadoop.fs.Path(d.getPath, "meta")))
      .map(d => Identifier.of(namespace, d.getPath.getName))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    // Iceberg-style metadata tables: `name$files` / `$partitions` /
    // `$tombstones` / `$history` (quote the identifier in SQL:
    // SELECT * FROM g.`events$files`). Metadata-only — zero data IO.
    val name = ident.name
    val dollar = name.lastIndexOf('$')
    if (dollar > 0 && GraftMetadataTable.Kinds.contains(name.substring(dollar + 1))) {
      val base = Identifier.of(ident.namespace, name.substring(0, dollar))
      if (!tableExists(base)) throw new NoSuchTableException(base)
      return new GraftMetadataTable(dirFor(base), name.substring(dollar + 1))
    }
    if (!tableExists(ident) && !recoverPublish(ident))
      throw new NoSuchTableException(ident)
    new GraftBatchTable(dirFor(ident))
  }

  /** Crash recovery for an interrupted RTAS publish (see
    * [[GraftStagedTable.commitStagedChanges]]): if the name is unbound
    * but a `.staging/publish-*.marker` names it as its final path,
    * finish the publish — prefer the STAGED directory (the RTAS had
    * fully written it before publication began), falling back to the
    * trashed old directory. Rename atomicity makes concurrent
    * recoverers safe: one wins, the others' renames fail and re-check.
    * Returns true when the table exists afterwards.
    */
  private def recoverPublish(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    val markers = GraftFS.list(s"$root/.staging")
      .filter(s => s.getPath.getName.startsWith("publish-") &&
        s.getPath.getName.endsWith(".marker"))
    markers.exists { m =>
      val lines =
        try GraftFS.readString(m.getPath.toString).split("\n").toSeq
        catch { case scala.util.control.NonFatal(_) => Nil }
      (lines.lift(0), lines.lift(1), lines.lift(2)) match {
        case (Some(staged), Some(fin), Some(trash))
            if fin == dir && !tableExists(ident) =>
          val (fs, dst) = GraftFS.resolve(fin)
          if (dst.getParent != null) fs.mkdirs(dst.getParent)
          def tryPublish(from: String): Boolean =
            GraftFS.exists(s"$from/meta") && {
              try { GraftFS.rename(new org.apache.hadoop.fs.Path(from), dst, fs); true }
              catch { case scala.util.control.NonFatal(_) => tableExists(ident) }
            }
          val recovered = tryPublish(staged) || tryPublish(trash)
          if (recovered) fs.delete(m.getPath, false)
          recovered
        case _ => false
      }
    }
  }

  /** SQL `VERSION AS OF <v>`: a read-only table pinned to state version
    * v — served from the retained log/snapshot chain, mutations refused.
    * Versions are the numeric state-store versions surfaced by the
    * `$history` metadata table and `GraftTable.loadAsOf`.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft table versions are numeric state versions (see `${ident.name}$$history`); " +
          s"got '$version'")
    }
    new GraftBatchTable(dirFor(ident), asOf = Some(v))
  }

  /** SQL `TIMESTAMP AS OF <t>`: resolves to the newest version committed
    * at or before t (Spark passes microseconds since the epoch).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val ms = timestamp / 1000L
    val v = JsonStateStore.versionAtOrBefore(s"${dirFor(ident)}/meta", ms).getOrElse(
      throw new IllegalArgumentException(
        s"no retained commit of ${ident.name} at or before " +
          s"${java.time.Instant.ofEpochMilli(ms)}"))
    new GraftBatchTable(dirFor(ident), asOf = Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    createAt(dirFor(ident), schema, partitions, properties)
    new GraftBatchTable(dirFor(ident))
  }

  /** Shared CREATE body: validate the DDL (keys, column order, persistent
    * configs) and materialize a table at `dir` — used by both the direct
    * CREATE TABLE path (dir = the table's final home) and the staged
    * CTAS/RTAS path (dir = a `.staging` scratch home that is renamed into
    * place only at commit).
    */
  private def createAt(dir: String, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Unit = {
    require(partitions.isEmpty,
      "graft manages partitioning internally — use the 'splitPoints' table property")
    val props = properties.asScala
    def names(k: String): Seq[String] =
      props.get(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val rowKeys = names("rowKeys")
    require(rowKeys.nonEmpty,
      "CREATE TABLE requires TBLPROPERTIES('rowKeys'='col[,col...]')")
    val sortKeys = names("sortKeys")
    def keyField(n: String): GraftField = {
      val f = schema.fields.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"key property names missing column: $n"))
      GraftField(f.name, f.dataType, nullable = false) // keys are never nullable
    }
    // The table's physical schema is ALWAYS (row keys, sort keys,
    // values) in that order; require the DDL to declare columns the same
    // way, because INSERT INTO resolves positionally against the table
    // schema — silently reordering would swap columns of compatible
    // types without any error.
    val declared = schema.fields.map(_.name).toSeq
    val expectedPrefix = rowKeys ++ sortKeys
    require(declared.take(expectedPrefix.size) == expectedPrefix,
      s"declare key columns first and in key order: expected leading columns " +
        s"(${expectedPrefix.mkString(", ")}), got (${declared.mkString(", ")})")
    val keyNames = expectedPrefix.toSet
    val values = schema.fields.toSeq.filterNot(f => keyNames(f.name))
      .map(f => GraftField(f.name, f.dataType, f.nullable))
    val gschema = GraftSchema(rowKeys.map(keyField), sortKeys.map(keyField), values)

    val splitPoints: Seq[Any] = names("splitPoints").map { s =>
      gschema.rowKeys.head.dataType match {
        case LongType => s.toLong
        case IntegerType => s.toInt
        case _ => s
      }
    }
    // Validate the persistent configs against the schema NOW, so a bad
    // property fails the DDL with a clear message instead of the first
    // ingest (note: aggregated value fields must be declared NOT NULL).
    val agg = props.getOrElse("aggregation", "")
    val filt = props.getOrElse("filter", "")
    val tf = props.getOrElse("transform", "")
    val idx = props.getOrElse("index", "")
    graft.dsl.ConfigDsl.parseAggregation(agg, gschema)
    graft.dsl.ConfigDsl.parseFilter(filt, gschema)
    graft.transforms.TransformFactory.parse(tf, gschema)
    graft.meta.BloomIndex.validate(gschema, idx)

    GraftFS.mkdirs(dir)
    JsonStateStore.create(s"$dir/meta", gschema,
      PartitionTree.fromSplitPoints(gschema, splitPoints),
      aggregationConfig = agg, filterConfig = filt, transformConfig = tf,
      indexConfig = idx)
    GraftFS.mkdirs(s"$dir/data")
  }

  // ---- Atomic CTAS / RTAS (StagingTableCatalog) --------------------------
  //
  // CREATE TABLE ... AS SELECT and REPLACE TABLE ... AS SELECT build the
  // whole table — metadata log AND data files — in a hidden
  // `<root>/.staging/<uuid>` home; the SELECT's write runs against that
  // staged table through the normal ingest dataflow, and only
  // commitStagedChanges() moves the finished directory into the catalog
  // namespace (one rename on local/HDFS; see GraftFS.rename for the
  // object-store caveat). A failed or cancelled SELECT therefore leaves NO
  // half-written table (abortStagedChanges deletes the scratch home), and
  // for RTAS readers of the old table are unaffected until the swap.

  private def stagingDir(ident: Identifier): String =
    s"$root/.staging/${(ident.namespace :+ ident.name).mkString("_")}-${java.util.UUID.randomUUID()}"

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val staged = stagingDir(ident)
    createAt(staged, schema, partitions, properties)
    new GraftStagedTable(staged, dirFor(ident), root, replaceExisting = false)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val staged = stagingDir(ident)
    createAt(staged, schema, partitions, properties)
    new GraftStagedTable(staged, dirFor(ident), root, replaceExisting = true)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): StagedTable = {
    val staged = stagingDir(ident)
    createAt(staged, schema, partitions, properties)
    new GraftStagedTable(staged, dirFor(ident), root, replaceExisting = true)
  }

  /** ALTER TABLE over the engine's versioned metadata transactions:
    *  - `ADD COLUMN x BIGINT` — m11 schema evolution: one O(1)
    *    AddColumn transaction, no data rewrite (readers null-fill;
    *    compaction converges files lazily);
    *  - `SET TBLPROPERTIES('filter'='ageOff(ts,...)', 'index'='bloom(c)',
    *    'aggregation'=..., 'transform'=...)` / `UNSET TBLPROPERTIES` —
    *    versioned property edits (SetProperties transaction; validation
    *    and mutability rules live there — aggregation only while empty).
    * Everything else is refused with the engine's own reasoning.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = dirFor(ident)
    // Phase 1 — classify and validate EVERY change before mutating
    // anything: a mixed statement carrying one unsupported or invalid
    // change must fail as a whole, never leave an earlier AddColumn
    // committed while the rest of the statement is refused.
    val adds = scala.collection.mutable.ArrayBuffer[GraftField]()
    val renames = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val drops = scala.collection.mutable.ArrayBuffer[String]()
    val propUpdates = scala.collection.mutable.LinkedHashMap[String, String]()
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          s"nested columns are not supported: ${add.fieldNames.mkString(".")}")
        require(add.isNullable,
          s"added column ${add.fieldNames.head} must be nullable " +
            "(existing files have no values for it)")
        adds += GraftField(add.fieldNames.head, add.dataType, nullable = true)
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames.length == 1,
          s"nested columns are not supported: ${ren.fieldNames.mkString(".")}")
        renames += ren.fieldNames.head -> ren.newName
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          s"nested columns are not supported: ${del.fieldNames.mkString(".")}")
        drops += del.fieldNames.head
      case set: TableChange.SetProperty =>
        propUpdates += set.property -> set.value
      case unset: TableChange.RemoveProperty =>
        propUpdates += unset.property -> ""
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change $other — graft supports ADD COLUMN " +
          "(nullable value columns), RENAME/DROP COLUMN (value columns, " +
          "metadata-only via column mapping), and SET/UNSET TBLPROPERTIES " +
          "(aggregation/filter/transform/index); keys and sort order are fixed")
    }
    val store = JsonStateStore.load(s"$dir/meta")
    if (adds.nonEmpty) require(store.aggregationConfig.trim.isEmpty,
      "cannot add a column to an aggregation-configured table " +
        s"(agg config '${store.aggregationConfig}' must cover every value column)")
    // Dry-run the column changes in statement order: every precondition
    // (key-column guards, name/alias/retired collisions, config
    // references) fires before anything mutates.
    val colTxns: Seq[graft.meta.StateTransaction] =
      adds.toSeq.map(graft.meta.StateTransaction.AddColumn(_)) ++
        renames.toSeq.map { case (f, t) => graft.meta.StateTransaction.RenameColumn(f, t) } ++
        drops.toSeq.map(graft.meta.StateTransaction.DropColumn(_))
    val postColSchema = store.preflight(colTxns)
    // Pre-validate property edits against the POST-change schema with the
    // same parsers the SetProperties transaction runs, so an invalid
    // property cannot fail the statement after the columns landed.
    if (propUpdates.nonEmpty) {
      val futureSchema = postColSchema
      propUpdates.foreach {
        case ("aggregation", v) =>
          require(store.fileReferences.isEmpty && store.tombstones.isEmpty,
            "aggregation config may only change while the table is empty")
          graft.dsl.ConfigDsl.parseAggregation(v, futureSchema)
        case ("filter", v) => graft.dsl.ConfigDsl.parseFilter(v, futureSchema)
        case ("index", v) => graft.meta.BloomIndex.validate(futureSchema, v)
        case ("transform", _) => // opaque (validated loadability mutator-side)
        case (other, _) => throw new IllegalArgumentException(
          s"unknown table property '$other' (expected aggregation/filter/transform/index)")
      }
    }
    // Phase 2 — the whole statement is known good: commit every column
    // change as ONE atomic Batch version. The preflight above produces
    // the error messages; the batch commit re-validates against the
    // state it actually lands on, so a concurrent writer slipping in
    // between the two (e.g. another ALTER adding a colliding name)
    // fails the statement AS A WHOLE instead of leaving an earlier
    // AddColumn committed with the rest refused.
    store.alterColumns(colTxns)
    if (propUpdates.nonEmpty) {
      val spark = org.apache.spark.sql.SparkSession.active
      graft.table.GraftTable.load(spark, dir).setProperties(propUpdates.toMap)
    }
    new GraftBatchTable(dir)
  }

  /** Delete any interrupted-publish markers whose FINAL path is `dir`,
    * together with their staged and trashed directories. Without this,
    * a marker left by a crash inside an RTAS publish window sits inert
    * while the table exists — and then a later legitimate DROP TABLE is
    * silently undone when the next loadTable "recovers" the aborted
    * RTAS's staged directory into the dropped name. Markers are removed
    * LAST: a crash mid-cleanup leaves the marker pointing at sources
    * that no longer hold a `meta` dir, which recoverPublish skips.
    */
  private def dropPublishMarkers(dir: String): Unit = {
    val staging = s"$root/.staging"
    GraftFS.list(staging)
      .filter(s => s.getPath.getName.startsWith("publish-") &&
        s.getPath.getName.endsWith(".marker"))
      .foreach { m =>
        val lines =
          try GraftFS.readString(m.getPath.toString).split("\n").toSeq
          catch { case scala.util.control.NonFatal(_) => Nil }
        (lines.lift(0), lines.lift(1), lines.lift(2)) match {
          case (Some(staged), Some(fin), Some(trash)) if fin == dir =>
            // staged/trash homes live under .staging — never a live table
            if (staged.startsWith(staging)) GraftFS.deleteRecursive(staged)
            if (trash.startsWith(staging)) GraftFS.deleteRecursive(trash)
            GraftFS.delete(m.getPath.toString)
          case _ => ()
        }
      }
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    // pending-publish markers naming this table die WITH it, or the next
    // loadTable of the dropped name would resurrect an aborted RTAS
    dropPublishMarkers(dirFor(ident))
    GraftFS.deleteRecursive(dirFor(ident))
    true
  }

  /** ALTER TABLE ... RENAME TO — one directory move. All paths inside the
    * state store (file references, tombstones, delta manifests) are
    * RELATIVE to the table home, so the move carries the full history:
    * time travel, `$history`, and the change feed keep working under the
    * new name. Atomic on local/HDFS; on object stores it is the
    * connector's copy+delete (same caveat as DROP).
    */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val src = dirFor(oldIdent)
    val dst = dirFor(newIdent)
    // a stale publish marker naming the OLD path would "recover" an
    // aborted RTAS into the vacated name after the rename — clean it up
    // exactly like DROP TABLE does
    dropPublishMarkers(src)
    val (fs, srcPath) = GraftFS.resolve(src)
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    if (dstPath.getParent != null) fs.mkdirs(dstPath.getParent)
    // Atomic fail-if-exists where the FS supports it: FileContext.rename
    // with Rename.NONE refuses an existing destination in the same
    // operation, closing the check-then-act window above (a concurrent
    // CREATE/RENAME landing between tableExists and the rename would
    // otherwise be clobbered — or, on HDFS, silently NESTED, since
    // FileSystem.rename into an existing directory moves the source
    // inside it). Schemes without an AbstractFileSystem binding fall
    // back to re-verifying immediately before the plain rename.
    val qSrc = fs.makeQualified(srcPath)
    val qDst = fs.makeQualified(dstPath)
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(qSrc.toUri, GraftFS.conf)
      fc.rename(qSrc, qDst, org.apache.hadoop.fs.Options.Rename.NONE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(dstPath)) throw new TableAlreadyExistsException(newIdent)
        GraftFS.rename(srcPath, dstPath, fs)
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new TableAlreadyExistsException(newIdent)
      case e: java.io.IOException if e.getMessage != null &&
          e.getMessage.contains("already exists") =>
        throw new TableAlreadyExistsException(newIdent)
    }
  }
}
