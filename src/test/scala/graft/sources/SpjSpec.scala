package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.LongType
import graft.core.{GraftField, GraftSchema}
import graft.table.GraftTable

/** Storage-partitioned joins through plain `spark.sql`: two
  * co-partitioned graft tables join (and GROUP BY their row key)
  * with ZERO shuffle exchanges, while tables with DIFFERENT split
  * points fall back to a normal shuffled join with correct results —
  * the soundness half of the fingerprinted-transform design
  * (see GraftPartitioning scaladoc).
  */
class SpjSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def schema(key: String, value: String) = GraftSchema(
    rowKeys = Seq(GraftField(key, LongType)),
    sortKeys = Nil,
    values = Seq(GraftField(value, LongType)))

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-spj").toString
    val splits = Seq(100L, 500L)
    val a = GraftTable.create(spark, s"$r/ta", schema("k", "va"), splitPoints = splits)
    a.ingest((0L until 1000L).map(i => (i, i * 2)).toDF("k", "va"))
    val b = GraftTable.create(spark, s"$r/tb", schema("kb", "vb"), splitPoints = splits)
    // half the keys, two ingests so leaves hold multiple runs
    val rows = (0L until 1000L by 2).map(i => (i, i + 7))
    b.ingest(rows.take(250).toDF("kb", "vb"))
    b.ingest(rows.drop(250).toDF("kb", "vb"))
    // same key space, DIFFERENT tiling: must NOT co-locate with ta/tb
    val c = GraftTable.create(spark, s"$r/tc", schema("kc", "vc"),
      splitPoints = Seq(300L))
    c.ingest((0L until 1000L by 4).map(i => (i, i + 1)).toDF("kc", "vc"))
    spark.conf.set("spark.sql.catalog.spj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spj.root", r)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    // broadcast (planner AND AQE-runtime) would bypass the exchange
    // question entirely at this size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    r
  }

  /** (shuffle exchanges, broadcast exchanges) in the FINAL executed
    * plan — a real storage-partitioned join has zero of both (a
    * broadcast join would also show zero shuffles, which is why the
    * positive assertions must exclude it too).
    */
  private def exchanges(df: DataFrame): (Int, Int) = {
    df.collect() // force AQE to finalize the executed plan
    graft.query.Plans.exchanges(df)
  }

  private def shuffles(df: DataFrame): Int = exchanges(df)._1

  test("co-partitioned join on the row key runs with zero shuffles") {
    root
    val df = spark.sql(
      """SELECT a.k, a.va, b.vb FROM spj.ta a JOIN spj.tb b ON a.k = b.kb
        |ORDER BY a.k""".stripMargin)
    val got = df.as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 500)
    assert(got.take(2) == Seq((0L, 0L, 7L), (2L, 4L, 9L)))
    assert(got.forall { case (k, va, vb) => va == k * 2 && vb == k + 7 })
    // the join itself must be exchange-free; ORDER BY adds a range
    // exchange above it, so assert on the unsorted join
    val join = spark.sql(
      "SELECT a.k, a.va, b.vb FROM spj.ta a JOIN spj.tb b ON a.k = b.kb")
    assert(exchanges(join) == ((0, 0)),
      s"expected storage-partitioned join, plan:\n${join.queryExecution.executedPlan}")
  }

  test("GROUP BY the row key aggregates with zero shuffles") {
    root
    val agg = spark.sql("SELECT k, sum(va) AS s FROM spj.ta GROUP BY k")
    assert(agg.as[(Long, Long)].collect().toMap.apply(7L) == 14L)
    assert(shuffles(agg) == 0,
      s"expected shuffle-free aggregation, plan:\n${agg.queryExecution.executedPlan}")
  }

  test("differently-split tables fall back to a shuffled join, correctly") {
    root
    val df = spark.sql(
      "SELECT a.k, c.vc FROM spj.ta a JOIN spj.tc c ON a.k = c.kc")
    val (sh, bc) = exchanges(df)
    assert(sh + bc > 0,
      s"different tilings must NOT storage-partition join, plan:\n${df.queryExecution.executedPlan}")
    assert(df.as[(Long, Long)].collect().toMap.apply(8L) == 9L)
  }

  test("leaf ordinals and fingerprints are canonical across tables") {
    root
    val ta = GraftTable.load(spark, s"$root/ta")
    val tb = GraftTable.load(spark, s"$root/tb")
    val tc = GraftTable.load(spark, s"$root/tc")
    assert(GraftPartitioning.fingerprint(ta.store.partitionTree) ==
      GraftPartitioning.fingerprint(tb.store.partitionTree))
    assert(GraftPartitioning.fingerprint(ta.store.partitionTree) !=
      GraftPartitioning.fingerprint(tc.store.partitionTree))
    val fp = GraftPartitioning.register(ta.store.partitionTree)
    val loc = GraftPartitioning.lookup(fp).get
    assert(loc.ordinalOf(Array(0L)) == 0)
    assert(loc.ordinalOf(Array(99L)) == 0)
    assert(loc.ordinalOf(Array(100L)) == 1)
    assert(loc.ordinalOf(Array(500L)) == 2)
    assert(loc.ordinalOf(Array(Long.MaxValue)) == 2)
  }
}
