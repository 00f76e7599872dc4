package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** File-grain data skipping on pushed integral comparisons: a pushed
  * `value > N` drops files whose sidecar min/max prove no row matches,
  * before any data IO — the non-key analog of region leaf pruning.
  */
class StatsSkipSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("id", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType), GraftField("s", StringType)))

  private def tmp() = Files.createTempDirectory("graft-skip").toString

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.head

  private def skipped(df: org.apache.spark.sql.DataFrame): Int = {
    val d = scanDesc(df)
    val m = "statsSkippedFiles=(\\d+)".r.findFirstMatchIn(d)
    assert(m.isDefined, s"no statsSkippedFiles in scan description: $d")
    m.get.group(1).toInt
  }

  /** Three ingests with disjoint v ranges into one leaf (interleaved
    * ids, so region pruning can't help — only file stats can).
    */
  private def seeded(): (String, GraftTable) = {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((0L until 30L by 3L).map(i => (i, i % 100, s"a$i")).toDF("id", "v", "s"))
    table.ingest((1L until 30L by 3L).map(i => (i, 100 + i, s"b$i")).toDF("id", "v", "s"))
    table.ingest((2L until 30L by 3L).map(i => (i, 200 + i, s"c$i")).toDF("id", "v", "s"))
    (dir, table)
  }

  test("pushed v-range comparison skips files whose stats exclude it") {
    val (dir, _) = seeded()
    val df = spark.read.format("graft").load(dir).filter($"v" >= 200L)
    val expect = (2L until 30L by 3L).map(i => (i, 200 + i)).toSet
    assert(df.select("id", "v").as[(Long, Long)].collect().toSet == expect)
    assert(skipped(df) == 2, "two of three files have max(v) < 200")

    // equality and IN skip too
    val eq = spark.read.format("graft").load(dir).filter($"v" === 101L)
    assert(eq.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(skipped(eq) == 2)

    val in = spark.read.format("graft").load(dir).filter($"v".isin(5000L, 101L))
    assert(in.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(skipped(in) == 2)

    // a predicate no file can satisfy reads nothing
    val none = spark.read.format("graft").load(dir).filter($"v" > 5000L)
    assert(none.count() == 0)
    assert(skipped(none) == 3)
  }

  test("string equality skips on the min/max string stats; unpushable predicates don't engage") {
    val (dir, _) = seeded()
    // files hold s-prefixes a*/b*/c* — disjoint UTF-8 ranges
    val df = spark.read.format("graft").load(dir).filter($"s" === "b1")
    assert(df.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(skipped(df) == 2, "a* and c* files exclude 'b1'")

    val rng = spark.read.format("graft").load(dir).filter($"s" >= "c")
    assert(rng.select("id").as[Long].collect().toSet == (2L until 30L by 3L).toSet)
    assert(skipped(rng) == 2)

    // EndsWith cannot map to a min/max range — no skipping engages
    val ew = spark.read.format("graft").load(dir).filter($"s".endsWith("1"))
    assert(ew.select("id").as[Long].collect().toSet ==
      (0L until 30L).filter(i => i.toString.endsWith("1")).toSet)
    assert(!scanDesc(ew).contains("statsSkippedFiles"),
      "unsupported predicate shape must not engage stats skipping")
  }

  test("pushed startsWith skips via the [prefix, succ(prefix)) range") {
    val (dir, _) = seeded()
    // files carry s ranges [a0,a9...], [b1,...], [c2,...]
    val df = spark.read.format("graft").load(dir).filter($"s".startsWith("b"))
    assert(df.select("id").as[Long].collect().toSet == (1L until 30L by 3L).toSet)
    assert(skipped(df) == 2, "the a* and c* files must skip on prefix 'b'")
    // a prefix between two files' ranges skips everything
    val none = spark.read.format("graft").load(dir).filter($"s".startsWith("bz"))
    assert(none.count() == 0)
    assert(skipped(none) == 3)
    // a prefix that is a prefix OF the min still keeps the file
    val keep = spark.read.format("graft").load(dir).filter($"s".startsWith("a"))
    assert(keep.select("id").as[Long].collect().toSet == (0L until 30L by 3L).toSet)
    assert(skipped(keep) == 2)
  }

  test("prefix maySatisfy handles multi-byte UTF-8 and boundary cases") {
    def p(prefix: String) = StatsPred("s", "prefix", Seq(prefix), isString = true)
    // range entirely below the prefix
    assert(!p("b").maySatisfy(5, "a0", "a9"))
    // range entirely above (min's first byte > prefix byte)
    assert(!p("b").maySatisfy(5, "c0", "c9"))
    // straddling range keeps
    assert(p("b").maySatisfy(5, "a0", "c9"))
    // min IS a prefix of the probe: min < succ, keep
    assert(p("ab").maySatisfy(5, "a", "zz"))
    // exact bounds: file [b, b] matches prefix "b"
    assert(p("b").maySatisfy(5, "b", "b"))
    // multi-byte: CJK range vs ASCII prefix and vice versa
    assert(!p("z").maySatisfy(5, "一", "鿿"))
    assert(p("中").maySatisfy(5, "中文", "中文z"))
    assert(!p("中").maySatisfy(5, "丮", "丯"))
    // all-null file never qualifies
    assert(!p("b").maySatisfy(0, "a", "z"))
  }

  test("skipping composes with key-region pruning") {
    val (dir, _) = seeded()
    val df = spark.read.format("graft").load(dir)
      .filter($"id" < 10L && $"v" >= 200L)
    assert(df.select("id", "v").as[(Long, Long)].collect().toSet ==
      Set((2L, 202L), (5L, 205L), (8L, 208L)))
    assert(skipped(df) == 2)
  }

  test("tables with a persistent aggregation never stats-skip (merged rows could pass)") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(aggregationConfig = "sum(v),min(s)"))
    table.ingest(Seq((1L, 60L, "x"), (2L, 10L, "y")).toDF("id", "v", "s"))
    table.ingest(Seq((1L, 60L, "x"), (2L, 10L, "y")).toDF("id", "v", "s"))
    // id=1 sums to 120: each input file's max(v)=60 fails `v > 100`,
    // but the merged row passes — skipping files would lose it.
    val df = spark.read.format("graft").load(dir).filter($"v" > 100L)
    assert(df.select("id", "v").as[(Long, Long)].collect().toSeq == Seq((1L, 120L)))
    val d = scanDesc(df)
    assert(d.contains("statsSkippedFiles=0"), s"aggregated table must not skip: $d")
  }

  test("string stats survive the streaming-merge compaction path") {
    val dir = tmp()
    // leaves split on id; s correlates with id, so each compacted leaf
    // file carries a tight s range written by the merge-task pass
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(10L, 20L))
    table.ingest((0L until 30L).map(i =>
      (i, i, (if (i < 10) "a" else if (i < 20) "b" else "c") + i)).toDF("id", "v", "s"))
    table.compactAll()
    val df = spark.read.format("graft").load(dir).filter($"s" >= "c")
    assert(df.select("id").as[Long].collect().toSet == (20L until 30L).toSet)
    assert(skipped(df) == 2, "the a* and b* compacted leaf files must skip")
  }

  test("missing sidecar entries keep the file (conservative)") {
    val (dir, table) = seeded()
    // wipe one file's sidecar: its stats are unknown, so it must be read
    val refs = table.store.fileReferences
    val f = s"$dir/data/${refs.head.physicalPartitionId}/${refs.head.filename}"
    val side = graft.meta.SketchSidecar.pathFor(f)
    assert(graft.meta.GraftFS.delete(side))
    val df = spark.read.format("graft").load(dir).filter($"v" >= 200L)
    assert(df.select("v").as[Long].collect().toSet ==
      (2L until 30L by 3L).map(200 + _).toSet)
    assert(skipped(df) <= 2)
  }
}
