package org.apache.spark.sql.execution.datasources.parquet

import java.lang.reflect.{InvocationHandler, Method, Proxy}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterPredicate
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge into Spark's vectorized parquet reader for the graft DSv2
  * scan's single-file fast path: a fully-compacted leaf (one leaf-local
  * sorted file, no pending filter/aggregation work) can be served as
  * ColumnarBatches at native scan speed instead of through the row-based
  * N-way merge (~2x slower for whole-table analytics) — the same
  * rationale as the reference's vectorized engine (docs/design.md:318-329).
  *
  * The row-group-reader seam
  * (`SpecificParquetRecordReaderBase.ParquetRowGroupReader`) and the
  * 4-arg `initialize` overload are JAVA package-private, so they carry
  * real bytecode access checks — and a runtime package is (loader,
  * name), not just name. When this library ships via `spark.jars` /
  * `--jars` (the normal cluster deployment), executors load it in a
  * child classloader, where a compile-time-in-package anonymous
  * implementation dies with IllegalAccessError (caught by
  * LocalClusterSpec under local-cluster, invisible under local[N]).
  * The seam is therefore crossed reflectively: a `java.lang.reflect
  * .Proxy` defined in the INTERFACE's own classloader implements the
  * package-private interface, and the protected `initialize` is invoked
  * via setAccessible — everything else referenced here is public, so
  * the bridge is classloader-safe however the jar is deployed. (The
  * Scala-side bridges — ExpressionUtils, RowToColumnConverter — need no
  * such treatment: Scala `private[sql]` erases to public bytecode.)
  */
object GraftVectorizedBridge {

  private val baseClass = classOf[SpecificParquetRecordReaderBase[_]]

  private lazy val rowGroupReaderIface: Class[_] =
    baseClass.getDeclaredClasses
      .find(_.getSimpleName == "ParquetRowGroupReader")
      .getOrElse(throw new IllegalStateException(
        "SpecificParquetRecordReaderBase.ParquetRowGroupReader not found — Spark internals moved"))

  private lazy val initializeMethod: Method = {
    val m = baseClass.getDeclaredMethod("initialize",
      classOf[MessageType], classOf[MessageType], rowGroupReaderIface, java.lang.Integer.TYPE)
    m.setAccessible(true)
    m
  }

  /** A ParquetRowGroupReader delegating to `fileReader`, defined in the
    * interface's own classloader so package access always holds.
    */
  private def rowGroupReaderFor(fileReader: ParquetFileReader): AnyRef =
    Proxy.newProxyInstance(
      rowGroupReaderIface.getClassLoader,
      Array(rowGroupReaderIface),
      new InvocationHandler {
        override def invoke(proxy: AnyRef, method: Method, args: Array[AnyRef]): AnyRef =
          method.getName match {
            case "readNextRowGroup" => fileReader.readNextRowGroup()
            case "close" => fileReader.close(); null
            case "hashCode" => Int.box(System.identityHashCode(proxy))
            case "equals" => Boolean.box(args != null && (proxy eq args(0)))
            case "toString" => "GraftRowGroupReader"
            case other => throw new UnsupportedOperationException(other)
          }
      })

  /** An initialized vectorized reader over one whole parquet file,
    * projected to `columns`, with optional row-group statistics
    * filtering (stats granularity only — page-level column-index
    * filtering is disabled because the batch reader's row accounting
    * assumes whole row groups). The caller loops `nextKeyValue()` /
    * `getCurrentValue` (a ColumnarBatch) and must `close()`.
    *
    * Schema evolution: columns absent from the file (appended by
    * AddColumn after it was written; necessarily nullable) ride as
    * constant-null vectors via the reader's partition-column seam, which
    * appends them AFTER the parquet columns — so the returned
    * permutation (caller column i -> batch column perm(i)) restores the
    * caller's order; None when the batch order already matches.
    */
  def open(path: String, columns: StructType, rowGroupFilter: Option[FilterPredicate],
      capacity: Int, conf: Configuration = new Configuration(),
      fileRange: Option[(Long, Long)] = None)
      : (VectorizedParquetRecordReader, Option[Array[Int]]) = {
    val hPath = new Path(path)
    val optsB = HadoopReadOptions.builder(conf, hPath)
    rowGroupFilter.foreach(p => optsB.withRecordFilter(FilterCompat.get(p)))
    fileRange.foreach { case (s, e) => optsB.withRange(s, e) }
    optsB.useColumnIndexFilter(false)
    val fileReader = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf), optsB.build())
    try {
      val fileSchema = fileReader.getFooter.getFileMetaData.getSchema
      val inFile = (0 until fileSchema.getFieldCount)
        .map(i => fileSchema.getFields.get(i).getName).toSet
      // Column mapping (RENAME COLUMN): a field's former names ride in
      // its metadata under "graftAliases"; the file serves the field
      // under the first of (name, aliases…) it carries.
      def physicalIn(f: org.apache.spark.sql.types.StructField): Option[String] = {
        val names =
          if (f.metadata.contains("graftAliases"))
            f.name +: f.metadata.getStringArray("graftAliases").toSeq
          else Seq(f.name)
        names.find(inFile)
      }
      val resolvedNames = columns.fields.map(f => f -> physicalIn(f)).toMap
      val present = columns.fields.filter(f => resolvedNames(f).isDefined)
      val missing = columns.fields.filter(f => resolvedNames(f).isEmpty)
      require(missing.forall(_.nullable),
        s"parquet file missing non-nullable columns: " +
          missing.filterNot(_.nullable).map(_.name).mkString(","))
      val requested = new MessageType(fileSchema.getName,
        present.map(f => fileSchema.getFields.get(
          fileSchema.getFieldIndex(resolvedNames(f).get))): _*)
      fileReader.setRequestedSchema(requested)
      val rows = fileReader.getRecordCount // sums only blocks surviving the filter
      require(rows <= Int.MaxValue, s"file too large for one vectorized task: $rows rows")
      val vec = new VectorizedParquetRecordReader(false, capacity)
      initializeMethod.invoke(vec, fileSchema, requested,
        rowGroupReaderFor(fileReader), Int.box(rows.toInt))
      vec.initBatch(StructType(missing),
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(missing.length))
      vec.enableReturningBatches()
      val perm =
        if (missing.isEmpty) None
        else {
          val presentIdx = present.map(_.name).zipWithIndex.toMap
          val missingIdx = missing.map(_.name).zipWithIndex.toMap
          Some(columns.fields.map(f => presentIdx.getOrElse(f.name,
            present.length + missingIdx(f.name))).toArray)
        }
      (vec, perm)
    } catch {
      case e: Throwable => fileReader.close(); throw e
    }
  }
}
