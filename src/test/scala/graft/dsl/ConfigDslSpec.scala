package graft.dsl

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{GraftField, GraftSchema}

/** Parser/validation semantics from the reference
  * (AggregationOpTest / Aggregation.java validation rules).
  */
class ConfigDslSpec extends AnyFunSuite {

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("key", StringType)),
    sortKeys = Seq(GraftField("ts", LongType)),
    values = Seq(
      GraftField("count", LongType),
      GraftField("m", MapType(StringType, LongType)),
      GraftField("note", StringType, nullable = true)))

  test("parses multi-op config") {
    val specs = ConfigDsl.parseAggregation("sum(count),map_max(m),min(note2)",
      schema.copy(values = schema.values.init :+ GraftField("note2", StringType)))
    assert(specs == Seq(ConfigDsl.AggSpec("sum", "count"), ConfigDsl.AggSpec("map_max", "m"),
      ConfigDsl.AggSpec("min", "note2")))
  }

  test("rejects aggregation of key fields") {
    val e = intercept[IllegalArgumentException](
      ConfigDsl.parseAggregation("sum(key),sum(count),map_sum(m),min(note)", schema))
    assert(e.getMessage.contains("key"))
  }

  test("rejects nullable fields") {
    intercept[IllegalArgumentException](
      ConfigDsl.parseAggregation("sum(count),map_sum(m),min(note)", schema))
  }

  test("rejects uncovered value fields") {
    val s = schema.copy(values = Seq(GraftField("count", LongType), GraftField("c2", LongType)))
    val e = intercept[IllegalArgumentException](ConfigDsl.parseAggregation("sum(count)", s))
    assert(e.getMessage.contains("c2"))
  }

  test("rejects map op on non-map and vice versa") {
    val s = schema.copy(values = Seq(GraftField("count", LongType)))
    intercept[IllegalArgumentException](ConfigDsl.parseAggregation("map_sum(count)", s))
    val s2 = schema.copy(values = Seq(GraftField("m", MapType(StringType, LongType))))
    intercept[IllegalArgumentException](ConfigDsl.parseAggregation("sum(m)", s2))
  }

  test("rejects duplicates and unknown ops") {
    val s = schema.copy(values = Seq(GraftField("count", LongType)))
    intercept[IllegalArgumentException](ConfigDsl.parseAggregation("sum(count),min(count)", s))
    intercept[IllegalArgumentException](ConfigDsl.parseAggregation("avg(count)", s))
  }

  test("ageOff parses and filters") {
    val f = ConfigDsl.parseFilter("ageOff(ts,1000)", schema).get
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq(("a", 100L, 1L), ("b", 9500L, 1L), ("c", 9000L, 1L))
      .toDF("key", "ts", "count")
    // now=10000, maxAge=1000 -> keep ts > 9000
    val kept = df.filter(f.toColumn(10000L)).select("key").as[String].collect().sorted
    assert(kept.sameElements(Array("b")))
  }

  test("ageOff drops null timestamps") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val f = ConfigDsl.parseFilter("ageOff(ts,1000)", schema).get
    val df = Seq(("a", Some(9999L), 1L), ("b", None, 1L))
      .toDF("key", "ts", "count")
    val kept = df.filter(f.toColumn(10000L)).select("key").as[String].collect()
    assert(kept.sameElements(Array("a")))
  }

  test("empty configs mean no-op") {
    assert(ConfigDsl.parseAggregation("", schema).isEmpty)
    assert(ConfigDsl.parseFilter("  ", schema).isEmpty)
  }
}
