package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MapMergeAgg._
import graft.functions.ConcatSortedAgg._
import graft.functions.QuantileSketchAgg._

/** Aggregation-op semantics ported from the reference's
  * AggregationOpTest / map_aggregate tests.
  */
class AggregatesSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("map_sum merges maps key-wise, summing collisions") {
    val df = Seq(
      ("k1", Map("a" -> 1L, "b" -> 2L)),
      ("k1", Map("b" -> 10L, "c" -> 3L)),
      ("k2", Map("z" -> 5L))).toDF("key", "m")
    val got = df.groupBy("key").agg(map_sum($"m").as("m"))
      .as[(String, Map[String, Long])].collect().toMap
    assert(got("k1") == Map("a" -> 1L, "b" -> 12L, "c" -> 3L))
    assert(got("k2") == Map("z" -> 5L))
  }

  test("map_min / map_max pick per-key extremes") {
    val df = Seq(
      ("k", Map("a" -> 5L, "b" -> 1L)),
      ("k", Map("a" -> 3L, "c" -> 9L))).toDF("key", "m")
    val mins = df.groupBy("key").agg(map_min($"m").as("m"))
      .as[(String, Map[String, Long])].collect().toMap
    val maxs = df.groupBy("key").agg(map_max($"m").as("m"))
      .as[(String, Map[String, Long])].collect().toMap
    assert(mins("k") == Map("a" -> 3L, "b" -> 1L, "c" -> 9L))
    assert(maxs("k") == Map("a" -> 5L, "b" -> 1L, "c" -> 9L))
  }

  test("map agg with string values: sum concatenates, min/max lexicographic") {
    val df = Seq(
      ("k", Map("a" -> "x")),
      ("k", Map("a" -> "y", "b" -> "q"))).toDF("key", "m")
    val sums = df.groupBy("key").agg(map_sum($"m").as("m"))
      .as[(String, Map[String, String])].collect().toMap
    assert(sums("k")("a").toSeq.sorted.mkString == "xy") // order of merge undefined; same chars
    assert(sums("k")("b") == "q")
    val mins = df.groupBy("key").agg(map_min($"m").as("m"))
      .as[(String, Map[String, String])].collect().toMap
    assert(mins("k") == Map("a" -> "x", "b" -> "q"))
  }

  test("map agg is distributed-merge safe (partial aggregation across partitions)") {
    val df = (1 to 1000).map(i => ("k" + (i % 7), Map((i % 13).toString -> 1L)))
      .toDF("key", "m").repartition(8)
    val got = df.groupBy("key").agg(map_sum($"m").as("m"))
      .as[(String, Map[String, Long])].collect().toMap
    val expected = (1 to 1000).groupBy(i => "k" + (i % 7)).map { case (k, is) =>
      k -> is.groupBy(i => (i % 13).toString).map { case (mk, xs) => mk -> xs.size.toLong }
    }
    assert(got == expected)
  }

  test("concat_sorted concatenates strings in sorted order") {
    val df = Seq(("k", "b"), ("k", "c"), ("k", "a")).toDF("key", "v").repartition(3)
    val got = df.groupBy("key").agg(concat_sorted($"v").as("v"))
      .as[(String, String)].collect().toMap
    assert(got("k") == "abc")
  }

  test("concat_sorted on binary uses unsigned order") {
    val df = Seq(
      ("k", Array[Byte](0x7f)), ("k", Array[Byte](-1)), ("k", Array[Byte](0))
    ).toDF("key", "v")
    val got = df.groupBy("key").agg(concat_sorted($"v").as("v"))
      .as[(String, Array[Byte])].collect().toMap
    // unsigned: 0x00 < 0x7f < 0xff
    assert(got("k").sameElements(Array[Byte](0, 0x7f, -1)))
  }

  test("map_sum merges equal binary keys (value equality, not reference)") {
    // Regression: Array[Byte] keys hashed by reference, so equal binary keys
    // produced duplicate map entries instead of merging.
    val df = Seq(
      ("k", Map(Array[Byte](1, 2) -> 10L)),
      ("k", Map(Array[Byte](1, 2) -> 5L, Array[Byte](3) -> 7L))).toDF("key", "m")
    val rows = df.groupBy("key").agg(map_sum($"m").as("m"))
      .selectExpr("map_keys(m) as ks", "map_values(m) as vs")
      .as[(Seq[Array[Byte]], Seq[Long])].collect()
    val (ks, vs) = rows.head
    assert(ks.size == 2, s"expected 2 distinct keys, got ${ks.size}")
    val byKey = ks.map(_.toSeq).zip(vs).toMap
    assert(byKey(Seq[Byte](1, 2)) == 15L)
    assert(byKey(Seq[Byte](3)) == 7L)
  }

  test("map agg with binary values: sum concatenates under wrapped buffer types") {
    val df = Seq(
      ("k", Map("a" -> Array[Byte](1))),
      ("k", Map("a" -> Array[Byte](2)))).toDF("key", "m")
    val m = df.groupBy("key").agg(map_sum($"m").as("m"))
      .selectExpr("m['a'] as v").as[Array[Byte]].head()
    assert(m.sorted.toSeq == Seq[Byte](1, 2))
  }

  test("sketch_agg builds a mergeable quantile sketch whose median is sane") {
    val df = (1L to 10000L).map(i => ("g", i)).toDF("g", "k").repartition(8)
    val bytes = df.groupBy("g").agg(sketch_agg($"k").as("s"))
      .select("s").as[Array[Byte]].head()
    val kind = KeySketch.LongKind
    val sketch = KeySketch.deserialize(kind, bytes)
    assert(sketch.getN == 10000)
    val median = KeySketch.medianSplitPoint(kind, sketch).get.asInstanceOf[Long]
    assert(median > 4000L && median < 6000L, s"median=$median")
  }

  test("sketch union across serialized parts matches whole (string keys)") {
    val kind = KeySketch.StringKind
    val s1 = KeySketch.empty(kind)
    val s2 = KeySketch.empty(kind)
    ('a' to 'm').foreach(c => s1.update(c.toString))
    ('n' to 'z').foreach(c => s2.update(c.toString))
    val merged = KeySketch.union(kind, Seq(
      KeySketch.serialize(kind, s1), KeySketch.serialize(kind, s2)))
    assert(merged.getN == 26)
    val m = KeySketch.medianSplitPoint(kind, merged).get.asInstanceOf[String]
    assert(m >= "m" && m <= "o", s"median=$m")
  }

  test("binary sketch round-trips through the custom serde") {
    val kind = KeySketch.BinaryKind
    val s = KeySketch.empty(kind)
    (0 until 100).foreach(i => s.update(Array[Byte](i.toByte, (i * 7).toByte)))
    val rt = KeySketch.deserialize(kind, KeySketch.serialize(kind, s))
    assert(rt.getN == 100)
  }
}
