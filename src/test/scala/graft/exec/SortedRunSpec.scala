package graft.exec

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Direct tests of the sorted-run merge machinery: the parquet →
  * InternalRow materializer (all graft types incl. list/map and nulls),
  * the N-way merge, the streaming key-equal aggregation, region clips,
  * and the parquet row-group filter.
  */
class SortedRunSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def writeSorted(rows: Seq[Row], schema: StructType): String = {
    val dir = Files.createTempDirectory("graft-run").toString
    val df = spark.createDataFrame(rows.asJava, schema).coalesce(1)
    df.write.mode("overwrite").parquet(dir)
    Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get.toString
  }

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", StringType)),
    sortKeys = Seq(GraftField("s", LongType)),
    values = Seq(
      GraftField("n", LongType),
      GraftField("tags", ArrayType(StringType), nullable = true),
      GraftField("m", MapType(StringType, LongType), nullable = true)))

  private val structType = schema.toStructType

  private def drain(spec: RunSpec): Seq[Seq[Any]] = {
    val fields = spec.output.map(schema.field)
    SortedRun.iterator(spec).map { r =>
      fields.zipWithIndex.map { case (f, i) =>
        if (r.isNullAt(i)) null
        else f.dataType match {
          case StringType => r.getUTF8String(i).toString
          case LongType => r.getLong(i)
          case IntegerType => r.getInt(i)
          case ArrayType(StringType, _) =>
            r.getArray(i) match {
              case null => null
              case a => (0 until a.numElements()).map(j =>
                if (a.isNullAt(j)) null else a.getUTF8String(j).toString)
            }
          case MapType(StringType, LongType, _) =>
            val m = r.getMap(i)
            (0 until m.numElements()).map(j =>
              m.keyArray().getUTF8String(j).toString -> m.valueArray().getLong(j)).toMap
          case other => r.get(i, other)
        }
      }
    }.toSeq
  }

  private val allCols = schema.allFields.map(_.name)

  test("materializer round-trips primitives, lists (incl. null elements), and maps") {
    val f = writeSorted(Seq(
      Row("a", 1L, 10L, Seq("x", null, "y"), Map("p" -> 1L)),
      Row("b", 2L, 20L, null, null)), structType)
    val got = drain(RunSpec(Seq(f), schema, allCols, None, "", "", 0L))
    assert(got == Seq(
      Seq("a", 1L, 10L, Seq("x", null, "y"), Map("p" -> 1L)),
      Seq("b", 2L, 20L, null, null)))
  }

  test("N-way merge interleaves sorted files by (row key, sort key)") {
    val f1 = writeSorted(Seq(
      Row("a", 1L, 1L, null, null), Row("c", 1L, 3L, null, null)), structType)
    val f2 = writeSorted(Seq(
      Row("a", 2L, 2L, null, null), Row("b", 1L, 9L, null, null)), structType)
    val f3 = writeSorted(Seq(Row("a", 1L, 7L, null, null)), structType)
    val got = drain(RunSpec(Seq(f1, f2, f3), schema, Seq("k", "s", "n"), None, "", "", 0L))
    assert(got.map(r => (r(0), r(1))) ==
      Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 1L), ("c", 1L)))
  }

  test("streaming key-equal aggregation merges across files (sum + map_sum)") {
    val f1 = writeSorted(Seq(
      Row("a", 1L, 1L, null, Map("x" -> 1L)), Row("b", 1L, 5L, null, Map.empty[String, Long])),
      structType)
    val f2 = writeSorted(Seq(
      Row("a", 1L, 2L, null, Map("x" -> 2L, "y" -> 7L))), structType)
    // aggregation requires non-nullable value fields covered by ops
    // (reference rule), so this spec's schema declares just n and m.
    val aggSchema = GraftSchema(schema.rowKeys, schema.sortKeys,
      Seq(GraftField("n", LongType), GraftField("m", MapType(StringType, LongType))))
    val spec2 = RunSpec(Seq(f1, f2), aggSchema, Seq("k", "s", "n", "m"), None,
      "sum(n),map_sum(m)", "", 0L)
    val got = SortedRun.iterator(spec2).map { r =>
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2),
        (0 until r.getMap(3).numElements()).map(j =>
          r.getMap(3).keyArray().getUTF8String(j).toString ->
            r.getMap(3).valueArray().getLong(j)).toMap)
    }.toSeq
    assert(got == Seq(("a", 1L, 3L, Map("x" -> 3L, "y" -> 7L)), ("b", 1L, 5L, Map())))
  }

  test("string concat-sum emits sorted order regardless of file arrival order") {
    val s2 = GraftSchema(
      rowKeys = Seq(GraftField("k", StringType)),
      sortKeys = Nil,
      values = Seq(GraftField("v", StringType)))
    // same key in two files; merge encounter order across files is arbitrary
    val f1 = writeSorted(Seq(Row("key", "zz")), s2.toStructType)
    val f2 = writeSorted(Seq(Row("key", "aa"), Row("key", "mm")), s2.toStructType)
    def run(paths: Seq[String]) =
      SortedRun.iterator(RunSpec(paths, s2, Seq("k", "v"), None, "sum(v)", "", 0L))
        .map(_.getUTF8String(1).toString).toSeq
    // ConcatSortedAgg semantics: sorted concatenation, order-insensitive
    assert(run(Seq(f1, f2)) == Seq("aammzz"))
    assert(run(Seq(f2, f1)) == Seq("aammzz"))
  }

  test("clip region and query regions filter rows (and row groups) correctly") {
    val f = writeSorted((0 until 100).map(i =>
      Row(f"k$i%03d", 1L, i.toLong, null, null)), structType)
    val clip = Region(KeyRange.minMax("k", "k010", "k050"))
    val got = drain(RunSpec(Seq(f), schema, Seq("k"), Some(clip), "", "", 0L))
    assert(got.size == 40 && got.head == Seq("k010") && got.last == Seq("k049"))

    val q = Region(KeyRange.exact("k", "k020"))
    val got2 = drain(RunSpec(Seq(f), schema, Seq("k"), Some(clip), "", "", 0L,
      queryRegions = Seq(q)))
    assert(got2 == Seq(Seq("k020")))

    // OR of two regions
    val got3 = drain(RunSpec(Seq(f), schema, Seq("k"), None, "", "", 0L,
      queryRegions = Seq(Region(KeyRange.exact("k", "k002")), Region(KeyRange.exact("k", "k077")))))
    assert(got3 == Seq(Seq("k002"), Seq("k077")))
  }

  test("ageOff filter drops old and null timestamps") {
    val s2 = GraftSchema(
      rowKeys = Seq(GraftField("k", StringType)),
      sortKeys = Nil,
      values = Seq(GraftField("ts", LongType, nullable = true)))
    val f = writeSorted(Seq(Row("a", 100L), Row("b", 900L), Row("c", null)),
      s2.toStructType)
    val spec = RunSpec(Seq(f), s2, Seq("k"), None, "", "ageOff(ts,500)", 1000L)
    val got = SortedRun.iterator(spec).map(_.getUTF8String(0).toString).toSeq
    assert(got == Seq("b")) // 1000-500=500 cutoff: a(100) too old, c null dropped
  }

  test("binary keys merge in unsigned order") {
    val s2 = GraftSchema(
      rowKeys = Seq(GraftField("k", BinaryType)),
      sortKeys = Nil,
      values = Seq(GraftField("n", LongType)))
    val f1 = writeSorted(Seq(
      Row(Array[Byte](1), 1L), Row(Array[Byte](-1), 3L)), s2.toStructType) // 0xff sorts last
    val f2 = writeSorted(Seq(Row(Array[Byte](0x7f), 2L)), s2.toStructType)
    val got = SortedRun.iterator(RunSpec(Seq(f1, f2), s2, Seq("n"), None, "", "", 0L))
      .map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("last-n scans prune to the trailing row groups and stay exact") {
    val s2 = GraftSchema(
      rowKeys = Seq(GraftField("k", StringType)),
      sortKeys = Nil,
      values = Seq(GraftField("n", LongType)))
    // tiny row groups so a few thousand rows span many of them
    def writeTiny(rows: Seq[Row]): String = {
      val dir = Files.createTempDirectory("graft-lastn").toString
      spark.createDataFrame(rows.asJava, s2.toStructType).coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", "4096").option("parquet.page.size", "1024")
        .parquet(dir)
      Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get.toString
    }
    val rowsA = (0 until 6000 by 2).map(i => Row(f"k$i%05d", i.toLong))
    val rowsB = (1 until 6000 by 2).map(i => Row(f"k$i%05d", i.toLong))
    val (fa, fb) = (writeTiny(rowsA), writeTiny(rowsB))

    val conf = graft.meta.GraftFS.conf
    // the helper finds a real (multi-row-group) suffix start...
    val start = SortedRun.lastRowGroupsStart(fa, 10L, conf)
    assert(start > 0L, "expected multiple row groups in the fixture file")
    // ...and asks for the whole file when n covers it
    assert(SortedRun.lastRowGroupsStart(fa, 10000L, conf) == 0L)

    // pruned last-n over a 2-file merge equals the unpruned answer
    def lastN(n: Int): Seq[Long] =
      SortedRun.iterator(RunSpec(Seq(fa, fb), s2, Seq("n"), None, "", "", 0L,
        limit = Some(n), limitLast = true)).map(_.getLong(0)).toSeq
    assert(lastN(5) == (5995L until 6000L).toSeq)
    // n spanning several row groups, odd boundary
    assert(lastN(137) == (5863L until 6000L).toSeq)
    // n larger than either file's row count degrades to the full merge
    assert(lastN(7000).size == 6000)
    assert(lastN(7000).take(3) == Seq(0L, 1L, 2L))

    // METADATA-ONLY PRUNE (VERDICT r14 #3): once the row-group layout
    // sidecar entry exists, the suffix computation reads ZERO footers —
    // same answers, no per-file round-trip on the last-page path.
    // Fresh copies: the sidecar cache memoizes ABSENCE (sound in
    // production, where sidecars are written before the commit that
    // exposes the data file — these test files were read bare above).
    def withSidecar(f: String): String = {
      val dst = f.stripSuffix(".parquet") + "-sc.parquet"
      Files.copy(java.nio.file.Paths.get(f), java.nio.file.Paths.get(dst))
      graft.meta.SketchSidecar.write(dst, Seq(graft.meta.SketchSidecar.rowGroupsEntry(dst)))
      dst
    }
    val (fa2, fb2) = (withSidecar(fa), withSidecar(fb))
    val before = SortedRun.footerFallbackReads.get()
    assert(SortedRun.lastRowGroupsStart(fa2, 10L, conf) == start)
    assert(SortedRun.lastRowGroupsStart(fa2, 10000L, conf) == 0L)
    val got137 = SortedRun.iterator(RunSpec(Seq(fa2, fb2), s2, Seq("n"), None, "", "", 0L,
      limit = Some(137), limitLast = true)).map(_.getLong(0)).toSeq
    assert(got137 == (5863L until 6000L).toSeq)
    assert(SortedRun.footerFallbackReads.get() == before,
      "sidecar-backed last-n must not open parquet footers")
  }
}
