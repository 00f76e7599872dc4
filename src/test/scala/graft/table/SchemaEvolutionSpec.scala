package graft.table

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Schema evolution (AddColumn): append-only nullable value columns.
  * Old files lack the column and must read as nulls through EVERY path —
  * the row-merge reader, the vectorized reader, the DSv2 scan, and the
  * compaction merge (which converges files to the widened schema).
  */
class SchemaEvolutionSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("id", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  private def tmp() = Files.createTempDirectory("graft-evolve").toString

  test("addColumn: old files read null, new files carry values, all reader paths") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(50L))
    // two pre-evolution files in the first leaf, so compactAll below has
    // real work there (single-file leaves are skipped as converged —
    // schema convergence is lazy, riding normal compaction)
    table.ingest((0L until 50L by 2).map(i => (i, i * 2)).toDF("id", "v"))
    table.ingest((1L until 50L by 2).map(i => (i, i * 2)).toDF("id", "v"))

    table.addColumn(GraftField("w", LongType, nullable = true))
    assert(table.schema.valueNames == Seq("v", "w"))
    table.ingest((50L until 100L).map(i => (i, i * 2, i * 3)).toDF("id", "v", "w"))

    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val rows = df.select("id", "v", "w").as[(Long, Long, Option[Long])]
        .collect().sortBy(_._1)
      assert(rows.length == 100)
      rows.foreach { case (id, v, w) =>
        assert(v == id * 2)
        assert(w == (if (id < 50) None else Some(id * 3)), s"id=$id")
      }
    }
    check(table.toDF) // row-merge reader (old file missing w)
    check(spark.read.format("graft").load(dir)) // DSv2 (mixed: old + new file)

    // a filter that selects ONLY the evolved column exercises projection
    val nulls = spark.read.format("graft").load(dir).filter($"w".isNull).count()
    assert(nulls == 50)

    // compaction merges old+new and converges files to the widened schema
    table.compactAll()
    check(table.toDF)
    check(spark.read.format("graft").load(dir)) // vectorized single-file path
    // post-compaction the evolved column is physically present everywhere
    val refs = table.store.fileReferences
    refs.foreach { r =>
      val p = table.pathOf(r)
      val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p), spark.sparkContext.hadoopConfiguration))
      try assert(footer.getFooter.getFileMetaData.getSchema.containsField("w"))
      finally footer.close()
    }
  }

  test("addColumn persists through the transaction log and respects time travel") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((0L until 10L).map(i => (i, i)).toDF("id", "v"))
    val vBefore = graft.meta.JsonStateStore.load(s"$dir/meta").currentVersion
    table.addColumn(GraftField("w", StringType, nullable = true))

    val reloaded = GraftTable.load(spark, dir)
    assert(reloaded.schema.valueNames == Seq("v", "w"))
    // historical snapshot still shows the pre-evolution schema
    val old = GraftTable.loadAsOf(spark, dir, vBefore)
    assert(old.schema.valueNames == Seq("v"))
  }

  test("addColumn guards: nullability, duplicates, keys, aggregation configs") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    intercept[IllegalArgumentException](
      table.addColumn(GraftField("w", LongType, nullable = false)))
    intercept[IllegalArgumentException](
      table.addColumn(GraftField("v", LongType, nullable = true)))

    val aggDir = tmp()
    val aggSchema = GraftSchema(Seq(GraftField("id", LongType)), Nil,
      Seq(GraftField("v", LongType, nullable = false)))
    val aggTable = GraftTable.create(spark, aggDir, aggSchema,
      config = TableConfig(aggregationConfig = "sum(v)"))
    intercept[IllegalArgumentException](
      aggTable.addColumn(GraftField("w", LongType, nullable = true)))
  }

  test("evolution works on nested-typed tables (Group reader path)") {
    val dir = tmp()
    val mapSchema = GraftSchema(
      rowKeys = Seq(GraftField("id", LongType)),
      sortKeys = Nil,
      values = Seq(GraftField("m", MapType(StringType, LongType), nullable = true)))
    val table = GraftTable.create(spark, dir, mapSchema)
    table.ingest((0L until 5L).map(i => (i, Map(s"k$i" -> i))).toDF("id", "m"))
    table.addColumn(GraftField("tag", StringType, nullable = true))
    table.ingest((5L until 10L).map(i => (i, Map(s"k$i" -> i), s"t$i")).toDF("id", "m", "tag"))
    val rows = table.toDF.select("id", "tag").as[(Long, Option[String])]
      .collect().sortBy(_._1)
    rows.foreach { case (id, tag) =>
      assert(tag == (if (id < 5) None else Some(s"t$id")))
    }
  }
}
