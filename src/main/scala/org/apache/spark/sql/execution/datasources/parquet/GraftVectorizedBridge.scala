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
    * projected to `columns` (batch columns come out in that order), with
    * optional row-group statistics filtering (stats granularity only —
    * page-level column-index filtering is disabled because the batch
    * reader's row accounting assumes whole row groups). The caller loops
    * `nextKeyValue()` / `getCurrentValue` (a ColumnarBatch) and must
    * `close()`.
    */
  def open(path: String, columns: Seq[String], rowGroupFilter: Option[FilterPredicate],
      capacity: Int, conf: Configuration = new Configuration()): VectorizedParquetRecordReader = {
    val hPath = new Path(path)
    val optsB = HadoopReadOptions.builder(conf, hPath)
    rowGroupFilter.foreach(p => optsB.withRecordFilter(FilterCompat.get(p)))
    optsB.useColumnIndexFilter(false)
    val fileReader = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf), optsB.build())
    try {
      val fileSchema = fileReader.getFooter.getFileMetaData.getSchema
      val requested = new MessageType(fileSchema.getName,
        columns.map(c => fileSchema.getFields.get(fileSchema.getFieldIndex(c))): _*)
      fileReader.setRequestedSchema(requested)
      val rows = fileReader.getRecordCount // sums only blocks surviving the filter
      require(rows <= Int.MaxValue, s"file too large for one vectorized task: $rows rows")
      val vec = new VectorizedParquetRecordReader(false, capacity)
      initializeMethod.invoke(vec, fileSchema, requested,
        rowGroupReaderFor(fileReader), Int.box(rows.toInt))
      vec.initBatch(new StructType(), InternalRow.empty)
      vec.enableReturningBatches()
      vec
    } catch {
      case e: Throwable => fileReader.close(); throw e
    }
  }
}
