package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class PartitionTreeSpec extends AnyFunSuite {

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("key", StringType)),
    sortKeys = Seq(GraftField("ts", LongType)),
    values = Seq(GraftField("value", StringType, nullable = true)))

  test("single-partition tree covers everything") {
    val t = PartitionTree.single(schema)
    assert(t.leaves.size == 1)
    assert(t.leafFor(Seq("anything")).id == "root")
  }

  test("fromSplitPoints: n points -> n+1 leaves with contiguous regions") {
    val t = PartitionTree.fromSplitPoints(schema, Seq("f", "m", "t"))
    assert(t.leaves.size == 4)
    assert(t.leafFor(Seq("a")) != t.leafFor(Seq("z")))
    // boundary: split point belongs to the right side (min-inclusive)
    assert(t.leafFor(Seq("m")).region.ranges.head.min.contains("m"))
    assert(t.leafFor(Seq("l")).region.ranges.head.max.contains("m"))
  }

  test("leafIdColumn agrees with leafFor on random keys") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val t = PartitionTree.fromSplitPoints(schema, Seq("d", "j", "p", "w"))
    val rnd = new Random(7)
    val keys = (1 to 300).map(_ => rnd.alphanumeric.take(3).mkString)
    val df = keys.toDF("key")
    val got = df.select($"key", t.leafIdColumn.as("pid")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    keys.foreach { k =>
      assert(got(k) == t.leafFor(Seq(k)).id, s"key $k")
    }
  }

  test("addSplit partitions a leaf region at the point") {
    val t0 = PartitionTree.single(schema)
    val t1 = t0.addSplit("root", 0, "m", "L", "R")
    assert(t1.leaves.map(_.id).toSet == Set("L", "R"))
    assert(t1.leafFor(Seq("a")).id == "L")
    assert(t1.leafFor(Seq("m")).id == "R") // split point goes right
    assert(t1.ancestors("L").map(_.id) == Seq("root"))
    // int dimension split on a multi-dim schema
    val schema2 = GraftSchema(
      Seq(GraftField("a", LongType), GraftField("b", IntType2.dt)), Nil,
      Seq(GraftField("v", StringType, nullable = true)))
    val t2 = PartitionTree.single(schema2).addSplit("root", 1, 10, "L", "R")
    assert(t2.leafFor(Seq(0L, 9)).id == "L")
    assert(t2.leafFor(Seq(0L, 10)).id == "R")
  }

  test("leavesOverlapping prunes to the query region") {
    val t = PartitionTree.fromSplitPoints(schema, Seq("f", "m", "t"))
    val hits = t.leavesOverlapping(Seq(Region(KeyRange.minMax("key", "g", "n"))))
    // [g,n) spans leaves [f,m) and [m,t)
    assert(hits.size == 2)
  }

  private object IntType2 { val dt: DataType = IntegerType }
}
