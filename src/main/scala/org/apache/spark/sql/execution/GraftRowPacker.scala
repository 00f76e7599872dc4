package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.vectorized.WritableColumnVector
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's private[execution] RowToColumnConverter for the
  * graft DSv2 mixed-scan columnar path: leaves that still need the
  * row-based N-way merge pack their rows into ColumnarBatches so they
  * can ride in the same (uniformly columnar) scan as fully-compacted
  * leaves served by the native vectorized parquet reader.
  */
final class GraftRowPacker(schema: StructType) extends Serializable {
  private val converter = new RowToColumnConverter(schema)
  def pack(row: InternalRow, vectors: Array[WritableColumnVector]): Unit =
    converter.convert(row, vectors)
}
