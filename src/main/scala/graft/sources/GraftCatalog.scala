package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
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
final class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"set spark.sql.catalog.$name.root to the catalog's base directory"))
  }

  override def name(): String = catalogName

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
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftBatchTable(dirFor(ident))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "graft manages partitioning internally — use the 'splitPoints' table property")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
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

    val dir = dirFor(ident)
    GraftFS.mkdirs(dir)
    JsonStateStore.create(s"$dir/meta", gschema,
      PartitionTree.fromSplitPoints(gschema, splitPoints),
      aggregationConfig = agg, filterConfig = filt, transformConfig = tf,
      indexConfig = idx)
    GraftFS.mkdirs(s"$dir/data")
    new GraftBatchTable(dir)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported — graft schemas are fixed at creation")

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    GraftFS.deleteRecursive(dirFor(ident))
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")
}
