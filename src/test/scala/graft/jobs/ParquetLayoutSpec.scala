package graft.jobs

import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.Encoding
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** Written table files carry the reference's point-lookup layout: ~8 MB
  * row groups, 128 KB pages, dictionary-encoded key columns (value
  * columns plain).
  */
class ParquetLayoutSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("key", StringType)),
    sortKeys = Seq(GraftField("ts", LongType)),
    values = Seq(GraftField("payload", StringType)))

  private def tmp() = Files.createTempDirectory("graft-layout").toString

  private def footerOf(path: String) = {
    val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path),
      spark.sparkContext.hadoopConfiguration))
    try rdr.getFooter finally rdr.close()
  }

  // Parquet's row-group flush check measures COMPRESSED buffered bytes,
  // so the payload must be incompressible (hex digests) for the 8 MB
  // target to be observable at test scale.
  private def digestPayload(i: Int): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val h1 = md.digest(BigInt(i).toByteArray).map("%02x".format(_)).mkString
    val h2 = md.digest(BigInt(i * 31 + 7).toByteArray).map("%02x".format(_)).mkString
    h1 + h2
  }

  test("ingest writes small row groups with dictionary keys and plain values") {
    val dir = tmp()
    // Split points ABOVE every generated key: 4 leaves keep the salt
    // sizing at one run (estimate/leaves < cores-worth) while all rows
    // land in leaf 0 as ONE big file — the multi-row-group layout needs
    // a single file larger than the 8 MB group target (the salted
    // multi-run path is covered by TableLifecycleSpec).
    val table = GraftTable.create(spark, dir, schema,
      splitPoints = Seq("z1", "z2", "z3"))
    // ~26 MB incompressible: 200k rows x 128 B (repetitive keys so the
    // dictionary encoder is actually exercised; unique sort keys)
    table.ingest((0 until 200000).map(i =>
      (f"key-${i % 500}%04d", i.toLong, digestPayload(i))).toDF("key", "ts", "payload"))

    val ref = table.store.fileReferences.head
    val footer = footerOf(table.pathOf(ref))
    val blocks = footer.getBlocks
    assert(blocks.size > 1, s"expected multiple ~8MB row groups, got ${blocks.size}")
    blocks.forEach { b =>
      assert(b.getCompressedSize <= 2L * ParquetLayout.RowGroupBytes,
        s"row group ${b.getCompressedSize}B compressed exceeds ~2x the 8MB target")
    }
    val byName = blocks.get(0).getColumns.asInstanceOf[java.util.List[
      org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]]
    def encodings(col: String) = {
      val it = byName.iterator()
      var found: Set[Encoding] = null
      while (it.hasNext) {
        val c = it.next()
        if (c.getPath.toDotString == col) found = {
          val s = scala.collection.mutable.Set.empty[Encoding]
          c.getEncodings.forEach(e => s += e)
          s.toSet
        }
      }
      assert(found != null, s"column $col missing from footer")
      found
    }
    val dictEncodings: Set[Encoding] =
      Set(Encoding.PLAIN_DICTIONARY, Encoding.RLE_DICTIONARY)
    assert(encodings("key").intersect(dictEncodings).nonEmpty,
      s"key column should be dictionary-encoded: ${encodings("key")}")
    assert(encodings("payload").intersect(dictEncodings).isEmpty,
      s"value column should not be dictionary-encoded: ${encodings("payload")}")
  }

  test("compaction preserves the layout") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(gcDelayMinutes = 0))
    def half(off: Int) = (0 until 100000).map(i =>
      (f"key-${i % 500}%04d", (off + i).toLong, digestPayload(off + i))).toDF("key", "ts", "payload")
    table.ingest(half(0))
    table.ingest(half(1000000))
    table.compactAll()
    val ref = table.store.fileReferences.head
    val footer = footerOf(table.pathOf(ref))
    assert(footer.getBlocks.size > 1,
      s"compacted file should keep ~8MB row groups, got ${footer.getBlocks.size}")
  }
}
