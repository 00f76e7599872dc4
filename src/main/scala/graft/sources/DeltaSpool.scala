package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType

/** Executor-side parquet writer for `InternalRow`s, used to spool the
  * row-level-DML delta (SQL DELETE/UPDATE/MERGE) before the driver folds
  * it into ONE atomic merge commit. Built on Spark's own
  * `ParquetWriteSupport`, so the spool files read back with
  * `spark.read.schema(st).parquet(...)` bit-exactly — including binary,
  * array and map columns.
  */
object DeltaSpool {

  private final class B(path: Path, conf: Configuration)
      extends ParquetWriter.Builder[InternalRow, B](path) {
    override def self(): B = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  /** Open a writer for `st` at `path`. The conf keys mirror what Spark's
    * parquet sink sets before handing the conf to ParquetWriteSupport
    * (which asserts their presence).
    */
  def open(path: String, st: StructType, conf: Configuration): ParquetWriter[InternalRow] = {
    val c = new Configuration(conf)
    ParquetWriteSupport.setSchema(st, c)
    val sc = org.apache.spark.sql.internal.SQLConf
    Seq(sc.PARQUET_WRITE_LEGACY_FORMAT, sc.PARQUET_OUTPUT_TIMESTAMP_TYPE,
        sc.PARQUET_FIELD_ID_WRITE_ENABLED, sc.PARQUET_REBASE_MODE_IN_WRITE,
        sc.PARQUET_INT96_REBASE_MODE_IN_WRITE,
        sc.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE)
      .foreach(e => c.setIfUnset(e.key, e.defaultValueString))
    new B(new Path(path), c)
      .withConf(c)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }
}
