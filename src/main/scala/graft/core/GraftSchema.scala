package graft.core

import org.apache.spark.sql.types._

/** A field in a graft table schema. Mirrors the reference's Field
  * (name + type + nullable, reference: java/core/.../schema/Field.java:25-50)
  * using Spark DataTypes directly as the type system.
  *
  * `aliases` = the column-mapping seam for RENAME COLUMN without data
  * rewrite (Delta's logical/physical split, alias-shaped): every former
  * name of this field, newest first. Files written before a rename
  * carry an alias as their physical column name; the parquet read
  * boundary (RowReadSupport / GraftVectorizedBridge) resolves a
  * requested field to the first of (name, aliases...) present in the
  * file. New files are always written under the CURRENT name, so
  * compaction naturally converges the physical layout.
  */
final case class GraftField(name: String, dataType: DataType, nullable: Boolean = false,
    aliases: Seq[String] = Nil) {
  /** Physical column candidates in a data file, preferred first. */
  def readNames: Seq[String] = name +: aliases

  /** StructField carrying the aliases as metadata (key "graftAliases"),
    * so readers taking a plain StructType (GraftVectorizedBridge) can
    * still resolve renamed columns in old files.
    */
  def toStructField: StructField = {
    val base = StructField(name, dataType, nullable)
    if (aliases.isEmpty) base
    else base.copy(metadata = new MetadataBuilder()
      .putStringArray("graftAliases", aliases.toArray).build())
  }
}

/** Table schema as three ordered field lists — row keys, sort keys, value
  * fields (reference: java/core/.../schema/Schema.java:39-43). Rules
  * enforced exactly as documented (docs/usage/schema.md):
  *  - row/sort keys: Int/Long/String/Binary only, never nullable;
  *  - values: additionally Array(primitive) and Map(primitive, primitive),
  *    one nesting level, nullable opt-in.
  *
  * The StructType mapping follows the reference's own Spark conversion
  * (bulk-import StructTypeFactory.java:54-73).
  */
final case class GraftSchema(
    rowKeys: Seq[GraftField],
    sortKeys: Seq[GraftField],
    values: Seq[GraftField],
    /** Physical column names no live field may claim: every name and
      * alias of DROPPED columns. Old data files still carry their bytes;
      * re-adding such a name would resurrect stale values into the new
      * column on pre-drop files (the Delta column-mapping hazard).
      * Time travel reads old snapshots' schemas, so dropped data stays
      * reachable at its historical versions.
      */
    retired: Seq[String] = Nil) {

  import GraftSchema._

  require(rowKeys.nonEmpty, "at least one row key field is required")
  locally {
    val all = rowKeys ++ sortKeys ++ values
    val dup = all.groupBy(_.name).collect { case (n, fs) if fs.size > 1 => n }
    require(dup.isEmpty, s"duplicate field names: ${dup.mkString(",")}")
    // a live name/alias claiming another field's physical column (or a
    // retired one) would make old-file reads ambiguous
    val claimed = all.flatMap(_.readNames) ++ retired
    val clash = claimed.groupBy(identity).collect { case (n, cs) if cs.size > 1 => n }
    require(clash.isEmpty,
      s"field names/aliases/retired names collide: ${clash.mkString(",")}")
  }
  (rowKeys ++ sortKeys).foreach { f =>
    require(isKeyType(f.dataType), s"key field ${f.name}: ${f.dataType.sql} is not a valid key type")
    require(!f.nullable, s"key field ${f.name} cannot be nullable")
  }
  values.foreach { f =>
    require(isValueType(f.dataType), s"value field ${f.name}: ${f.dataType.sql} is not a valid value type")
  }

  def keyFields: Seq[GraftField] = rowKeys ++ sortKeys
  def allFields: Seq[GraftField] = rowKeys ++ sortKeys ++ values
  def rowKeyNames: Seq[String] = rowKeys.map(_.name)
  def sortKeyNames: Seq[String] = sortKeys.map(_.name)
  def keyNames: Seq[String] = keyFields.map(_.name)
  def valueNames: Seq[String] = values.map(_.name)

  def toStructType: StructType =
    StructType(allFields.map(f => StructField(f.name, f.dataType, f.nullable)))

  def field(name: String): GraftField =
    allFields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no such field: $name"))
}

object GraftSchema {
  private val keyTypes: Set[DataType] = Set(IntegerType, LongType, StringType, BinaryType)

  /** Parse the reference's schema JSON interchange form (see
    * graft.query.SchemaSerDe; example/basic/schema.json).
    */
  def fromJson(json: String): GraftSchema = graft.query.SchemaSerDe.fromJson(json)

  def isKeyType(t: DataType): Boolean = keyTypes.contains(t)

  /** Float/double (and their arrays) are an ENGINE EXTENSION past the
    * reference's value types (reference SchemaSerDe.java knows only
    * int/long/string/bytes + lists/maps): an ML-data table holds
    * embedding (`ARRAY<FLOAT>`) and score columns as first-class
    * values. They ride the ingest/merge/query paths opaquely (never as
    * keys, never under the concat/map aggregation ops, which stay
    * key-typed).
    */
  private val valueOnlyTypes: Set[DataType] = Set(FloatType, DoubleType)

  def isValueType(t: DataType): Boolean = t match {
    case t if keyTypes.contains(t) || valueOnlyTypes.contains(t) => true
    case ArrayType(e, _) => keyTypes.contains(e) || valueOnlyTypes.contains(e)
    case MapType(k, v, _) => keyTypes.contains(k) && keyTypes.contains(v)
    case _ => false
  }
}
