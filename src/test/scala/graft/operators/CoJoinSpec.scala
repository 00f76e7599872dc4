package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** Co-partitioned merge join: correctness vs a Spark join oracle,
  * many-to-many groups, left-outer nulls, tree-mismatch rejection, and
  * the structural scale claims (one task per leaf, zero shuffle
  * dependencies in the lineage).
  */
class CoJoinSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-cojoin-spec").toString

  private val lSchema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Seq(GraftField("seq", LongType)),
    values = Seq(GraftField("lv", StringType, nullable = true)))
  private val rSchema = GraftSchema(
    rowKeys = Seq(GraftField("rk", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("rv", LongType)))

  private def buildPair(splits: Seq[Any]): (GraftTable, GraftTable) = {
    val lt = GraftTable.create(spark, tmp(), lSchema, splitPoints = splits)
    val rt = GraftTable.create(spark, tmp(), rSchema, splitPoints = splits)
    // left: keys 0..99, two rows per key (distinct sort keys), two batches
    val lrows = for (k <- 0L until 100L; s <- Seq(0L, 1L)) yield (k, s, s"v$k-$s")
    lt.ingest(lrows.filter(_._2 == 0L).toDF("k", "seq", "lv"))
    lt.ingest(lrows.filter(_._2 == 1L).toDF("k", "seq", "lv"))
    // right: only even keys, duplicated ×2 for many-to-many groups
    val rrows = for (k <- 0L until 100L by 2; d <- Seq(10L, 20L)) yield (k, k * 100 + d)
    rt.ingest(rrows.toDF("rk", "rv"))
    (lt, rt)
  }

  test("inner join equals the Spark join oracle (many-to-many groups)") {
    val (lt, rt) = buildPair(Seq(30L, 60L))
    val got = lt.coJoin(rt).select("k", "seq", "lv", "rv")
      .as[(Long, Long, String, Long)].collect().toSet
    val oracle = lt.toDF.join(rt.toDF, $"k" === $"rk").select("k", "seq", "lv", "rv")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got == oracle)
    // 50 even keys × 2 left rows × 2 right rows
    assert(got.size == 200)
  }

  test("left join keeps unmatched keys with null right columns") {
    val (lt, rt) = buildPair(Seq(30L, 60L))
    val got = lt.coJoin(rt, "left")
    assert(got.schema("rv").nullable)
    val rows = got.select("k", "rv").as[(Long, Option[Long])].collect()
    assert(rows.length == 200 + 100) // matches + 50 odd keys × 2 rows
    assert(rows.filter(_._2.isEmpty).map(_._1).forall(_ % 2 == 1))
    assert(rows.count(_._2.isEmpty) == 100)
  }

  test("one task per leaf pair and zero shuffle dependencies in the lineage") {
    val (lt, rt) = buildPair(Seq(30L, 60L))
    val joined = lt.coJoin(rt)
    val rdd = joined.queryExecution.toRdd
    assert(rdd.getNumPartitions == lt.store.partitionTree.leaves.size)
    def shuffles(r: org.apache.spark.rdd.RDD[_]): Seq[String] =
      r.dependencies.flatMap {
        case s: org.apache.spark.ShuffleDependency[_, _, _] => Seq(s.toString)
        case d => shuffles(d.rdd)
      }
    assert(shuffles(rdd).isEmpty, "co-partitioned join must not shuffle")
  }

  test("persistent aggregation applies inside the join streams") {
    val splits = Seq(5L)
    val lt = GraftTable.create(spark, tmp(),
      GraftSchema(Seq(GraftField("k", LongType)), Nil, Seq(GraftField("n", LongType))),
      splitPoints = splits, config = TableConfig(aggregationConfig = "sum(n)"))
    val rt = GraftTable.create(spark, tmp(), rSchema, splitPoints = splits)
    lt.ingest(Seq((1L, 2L), (1L, 3L), (7L, 1L)).toDF("k", "n"))
    lt.ingest(Seq((1L, 5L), (7L, 4L)).toDF("k", "n"))
    rt.ingest(Seq((1L, 100L), (7L, 700L)).toDF("rk", "rv"))
    val got = lt.coJoin(rt).select("k", "n", "rv")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 100L), (7L, 5L, 700L)))
  }

  test("string keys join across leaves, including separator-ish content") {
    val sS = GraftSchema(Seq(GraftField("k", StringType)), Nil,
      Seq(GraftField("v", LongType)))
    val lt = GraftTable.create(spark, tmp(), sS, splitPoints = Seq("m"))
    val rt = GraftTable.create(spark, tmp(), sS.copy(
      values = Seq(GraftField("w", LongType))), splitPoints = Seq("m"))
    lt.ingest(Seq(("a", 1L), ("mx", 2L), ("z", 3L)).toDF("k", "v"))
    rt.ingest(Seq(("a", 10L), ("mx", 20L)).toDF("k", "w"))
    val got = lt.coJoin(rt).select("k", "v", "w")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 10L), ("mx", 2L, 20L)))
  }

  test("mismatched partition trees and clashing column names are rejected") {
    val (lt, _) = buildPair(Seq(30L, 60L))
    val rtOther = GraftTable.create(spark, tmp(), rSchema, splitPoints = Seq(50L))
    intercept[IllegalArgumentException](lt.coJoin(rtOther))
    val rtClash = GraftTable.create(spark, tmp(),
      GraftSchema(Seq(GraftField("rk", LongType)), Nil,
        Seq(GraftField("lv", LongType))), splitPoints = Seq(30L, 60L))
    intercept[IllegalArgumentException](lt.coJoin(rtClash))
    intercept[IllegalArgumentException](lt.coJoin(lt, "full"))
  }
}
