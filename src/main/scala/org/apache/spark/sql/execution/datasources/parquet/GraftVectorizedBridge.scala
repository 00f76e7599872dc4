package org.apache.spark.sql.execution.datasources.parquet

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
  * Lives in Spark's parquet package because the row-group-reader seam
  * (`SpecificParquetRecordReaderBase.ParquetRowGroupReader`) and the
  * 4-arg `initialize` overload are package-private/protected.
  */
object GraftVectorizedBridge {

  /** Exposes the protected schema-level initialize. */
  private final class GraftVectorizedReader(capacity: Int)
      extends VectorizedParquetRecordReader(false, capacity) {
    def initWith(fileSchema: MessageType, requested: MessageType,
        r: SpecificParquetRecordReaderBase.ParquetRowGroupReader, rows: Int): Unit =
      initialize(fileSchema, requested, r, rows)
  }

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
      val vec = new GraftVectorizedReader(capacity)
      val rgr = new SpecificParquetRecordReaderBase.ParquetRowGroupReader {
        override def readNextRowGroup() = fileReader.readNextRowGroup()
        override def close(): Unit = fileReader.close()
      }
      vec.initWith(fileSchema, requested, rgr, rows.toInt)
      vec.initBatch(new StructType(), InternalRow.empty)
      vec.enableReturningBatches()
      vec
    } catch {
      case e: Throwable => fileReader.close(); throw e
    }
  }
}
