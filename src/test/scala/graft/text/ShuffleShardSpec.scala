package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed shuffle-shard must equal the naive single-window
  * definition (row_number + NTILE over the hash order) exactly, stay
  * deterministic across runs, and materialize balanced, order-preserving
  * shard files.
  */
class ShuffleShardSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def naive(n: Int, shards: Int): Map[Long, (Long, Long)] = {
    val df = (0 until n).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    val w = Window.orderBy(MixtureSampling.orderHash(col("id")), col("id"))
    df.withColumn("position", row_number().over(w).cast("long"))
      .withColumn("shard", ntile(shards).over(w).cast("long"))
      .select("id", "position", "shard")
      .as[(Long, Long, Long)].collect().map { case (i, p, s) => i -> (p, s) }.toMap
  }

  test("equals the naive window definition across remainder edge cases") {
    for ((n, shards) <- Seq((103, 8), (96, 8), (7, 16), (200, 7))) {
      val df = (0 until n).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
      val got = ShuffleShard.shuffleShards(df, "id", shards)
        .select("id", "position", "shard")
        .as[(Long, Long, Long)].collect().map { case (i, p, s) => i -> (p, s) }.toMap
      assert(got == naive(n, shards), s"n=$n shards=$shards")
    }
  }

  test("deterministic across runs") {
    val df = (0 until 500).map(i => (i.toLong * 3 + 1, s"d$i")).toDF("id", "text")
    val a = ShuffleShard.shuffleShards(df, "id", 8)
      .select("id", "position", "shard").as[(Long, Long, Long)].collect().toSet
    val b = ShuffleShard.shuffleShards(df, "id", 8)
      .select("id", "position", "shard").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("writeShards materializes balanced shards that preserve the order") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = (0 until 250).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    ShuffleShard.writeShards(df, "id", shards = 8, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 250)
    val sizes = back.groupBy("shard").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes.keySet == (1L to 8L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    // within every shard the positions are a contiguous run
    val spans = back.groupBy("shard")
      .agg(min("position").as("lo"), max("position").as("hi"), count(lit(1)).as("c"))
      .as[(Long, Long, Long, Long)].collect()
    spans.foreach { case (s, lo, hi, c) => assert(hi - lo + 1 == c, s"shard $s") }
  }
}
