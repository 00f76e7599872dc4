package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.meta.BloomIndex
import graft.table.{GraftTable, TableConfig}

/** Per-file Bloom value indexes (`indexConfig = "bloom(col)"`): equality
  * data skipping for files whose min/max stats STRADDLE the probe value
  * — the categorical/high-cardinality case min/max cannot discriminate.
  */
class BloomSkipSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("id", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType), GraftField("s", StringType)))

  private def tmp() = Files.createTempDirectory("graft-bloom").toString

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.head

  private def bloomSkipped(df: org.apache.spark.sql.DataFrame): Int = {
    val d = scanDesc(df)
    val m = "bloomSkippedFiles=(\\d+)".r.findFirstMatchIn(d)
    assert(m.isDefined, s"no bloomSkippedFiles in scan description: $d")
    m.get.group(1).toInt
  }

  test("hash family is exactly Spark's xxhash64, both types") {
    val row = spark.sql("SELECT xxhash64('purchase') AS hs, xxhash64(CAST(123456789 AS BIGINT)) AS hl")
      .head()
    assert(BloomIndex.hashValue("purchase").contains(row.getLong(0)))
    assert(BloomIndex.hashValue(123456789L).contains(row.getLong(1)))
  }

  test("config parsing and validation") {
    assert(BloomIndex.parse("bloom(a),bloom(b,5000)") ==
      Seq(BloomIndex.BloomSpec("a", BloomIndex.DefaultExpectedItems),
        BloomIndex.BloomSpec("b", 5000L)))
    assert(BloomIndex.parse("  ") == Nil)
    intercept[IllegalArgumentException](BloomIndex.parse("hnsw(a)"))
    intercept[IllegalArgumentException](BloomIndex.validate(schema, "bloom(nope)"))
    val bad = GraftSchema(Seq(GraftField("id", LongType)), Nil,
      Seq(GraftField("n", IntegerType)))
    // int columns are rejected: their hash family differs from long's
    // (the CMS int-probe bug class from the round-11 advice)
    intercept[IllegalArgumentException](BloomIndex.validate(bad, "bloom(n)"))
  }

  /** Three ingest batches whose v/s RANGES all straddle the probe values
    * (min/max keeps every file) but whose value SETS are disjoint (the
    * Bloom filter discriminates).
    */
  private def seeded(): String = {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(indexConfig = "bloom(v),bloom(s)"))
    table.ingest((0L until 30L by 3L).map(i =>
      (i, if (i % 2 == 0) 10L else 290L, if (i % 2 == 0) "aa" else "zz"))
      .toDF("id", "v", "s"))
    table.ingest((1L until 30L by 3L).map(i => (i, 150L, "mm")).toDF("id", "v", "s"))
    table.ingest((2L until 30L by 3L).map(i =>
      (i, if (i % 2 == 0) 50L else 200L, if (i % 2 == 0) "cc" else "tt"))
      .toDF("id", "v", "s"))
    dir
  }

  test("equality on a bloom-indexed long skips files min/max cannot prune") {
    val dir = seeded()
    val df = spark.read.format("graft").load(dir).filter($"v" === 150L)
    assert(df.select("id").as[Long].collect().toSet == (1L until 30L by 3L).toSet)
    assert(bloomSkipped(df) == 2,
      "both non-matching files straddle v=150 — only the bloom can prune them")

    val in = spark.read.format("graft").load(dir).filter($"v".isin(150L, 999L))
    assert(in.select("id").as[Long].collect().toSet == (1L until 30L by 3L).toSet)
    assert(bloomSkipped(in) == 2)
  }

  test("equality on a bloom-indexed string skips straddling files") {
    val dir = seeded()
    val df = spark.read.format("graft").load(dir).filter($"s" === "mm")
    assert(df.select("id").as[Long].collect().toSet == (1L until 30L by 3L).toSet)
    assert(bloomSkipped(df) == 2, "aa..zz and cc..tt files straddle 'mm'")
  }

  test("blooms survive the one-pass compaction merge") {
    val dir = seeded()
    val table = GraftTable.load(spark, dir)
    assert(table.config.indexConfig == "bloom(v),bloom(s)",
      "indexConfig must round-trip through the state store")

    // 2 leaves x 2 ingests: leaf1 holds {aa,zz}, leaf2 holds {bb,yy} —
    // leaf1's string RANGE straddles 'bb', so after compactAll merges
    // each leaf to one file, only a compaction-written bloom can prune it
    val dir2 = tmp()
    val t2 = GraftTable.create(spark, dir2, schema, splitPoints = Seq(15L),
      config = TableConfig(indexConfig = "bloom(s)"))
    def rows(lo: Long, hi: Long, a: String, b: String) =
      (lo until hi).map(i => (i, i, if (i % 2 == 0) a else b)).toDF("id", "v", "s")
    t2.ingest(rows(0L, 15L, "aa", "zz").union(rows(15L, 30L, "bb", "yy")))
    t2.ingest(rows(0L, 15L, "aa", "zz").union(rows(15L, 30L, "bb", "yy")))
    t2.compactAll()
    assert(t2.store.fileReferences.groupBy(_.partitionId).values.forall(_.size == 1),
      "compactAll must leave one file per leaf")
    val df = spark.read.format("graft").load(dir2).filter($"s" === "bb")
    assert(df.select("id").as[Long].collect().toSet ==
      (15L until 30L).filter(_ % 2 == 0).toSet)
    assert(bloomSkipped(df) == 1,
      "leaf1's compacted file straddles 'bb' — its bloom must reject it")
  }

  test("no index config -> no bloom counter; non-equality shapes don't engage") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    table.ingest((0L until 10L).map(i => (i, i, s"x$i")).toDF("id", "v", "s"))
    val df = spark.read.format("graft").load(dir).filter($"s" === "x1")
    assert(!scanDesc(df).contains("bloomSkippedFiles"))

    val dir2 = seeded()
    val rng = spark.read.format("graft").load(dir2).filter($"s" >= "zz")
    assert(!scanDesc(rng).contains("bloomSkippedFiles"),
      "range predicates must not build bloom probes")
    assert(rng.select("id").as[Long].collect().toSet ==
      (0L until 30L by 3L).filter(_ % 2 == 1).toSet)
  }

  test("aggregation-configured tables decline bloom skipping") {
    val dir = tmp()
    val aggSchema = GraftSchema(
      rowKeys = Seq(GraftField("id", LongType)),
      sortKeys = Nil,
      values = Seq(GraftField("v", LongType, nullable = false)))
    val table = GraftTable.create(spark, dir, aggSchema,
      config = TableConfig(aggregationConfig = "sum(v)", indexConfig = "bloom(v)"))
    table.ingest((0L until 10L).map(i => (i, 7L)).toDF("id", "v"))
    table.ingest((0L until 10L).map(i => (i, 7L)).toDF("id", "v"))
    // merged v=14 exists though no FILE contains 14 — skipping must not fire
    val df = spark.read.format("graft").load(dir).filter($"v" === 14L)
    assert(df.count() == 10L)
  }
}
