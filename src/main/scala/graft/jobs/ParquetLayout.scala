package graft.jobs

import org.apache.spark.sql.DataFrameWriter
import graft.core.GraftSchema

/** Parquet physical layout for table data files, mirroring the
  * reference's point-lookup-tuned defaults instead of Spark's
  * analytics-tuned ones: 8 MB row groups and 128 KB pages — so a key
  * lookup inside a leaf touches ~one page per column rather than
  * decoding a 128 MB Spark-default row group — with dictionary encoding
  * forced on key columns (highly effective on sorted runs) and off for
  * value columns (reference:
  * docs/usage/properties/table/data_definition.md, rationale
  * docs/design.md:73-82; rust ParquetWriterConfigurer,
  * rust/sleeper_core/src/datafusion/config.rs).
  *
  * Applied to every table data write (ingest + both compaction paths);
  * bulk export keeps Spark defaults (its consumers are whole-file
  * analytics scans).
  */
object ParquetLayout {

  /** Row-group target (uncompressed buffered bytes at the writer). */
  val RowGroupBytes: Long = 8L * 1024 * 1024

  /** Page target — the point-lookup IO granule. */
  val PageBytes: Int = 128 * 1024

  def configure[T](w: DataFrameWriter[T], schema: GraftSchema): DataFrameWriter[T] = {
    val base = w
      .option("parquet.block.size", RowGroupBytes.toString)
      .option("parquet.page.size", PageBytes.toString)
    val withKeys = schema.keyNames.foldLeft(base)((acc, k) =>
      acc.option(s"parquet.enable.dictionary#$k", "true"))
    schema.values.map(_.name).foldLeft(withKeys)((acc, v) =>
      acc.option(s"parquet.enable.dictionary#$v", "false"))
  }
}
