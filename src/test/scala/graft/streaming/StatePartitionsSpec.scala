package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The streaming drains size their state partitioning from input bytes
  * (VERDICT r10: a pinned 8 under-partitions a 100× stream) — floored
  * at 8, capped at the session's shuffle parallelism, and overridable
  * via `graft.streaming.statePartitions`. Derivation must also never
  * leak conf into the caller's session (the drains run in a scoped
  * `newSession`).
  */
class StatePartitionsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("floor of 8 for small inputs, scales with bytes, capped at session parallelism") {
    val cap = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(StreamAnalytics.statePartitionsFor(spark, 0L) == 8)
    assert(StreamAnalytics.statePartitionsFor(spark, 10L << 20) == 8)
    // 20 partitions' worth of bytes at 128MB each
    val twenty = StreamAnalytics.statePartitionsFor(spark, 20L * (128L << 20))
    assert(twenty == math.max(8, math.min(20, cap)))
    // far past the cap: clamped, not unbounded
    assert(StreamAnalytics.statePartitionsFor(spark, 10000L * (128L << 20)) ==
      math.max(8, cap))
  }

  test("explicit conf override wins") {
    spark.conf.set("graft.streaming.statePartitions", "13")
    try assert(StreamAnalytics.statePartitionsFor(spark, 0L) == 13)
    finally spark.conf.unset("graft.streaming.statePartitions")
  }

  test("a drain leaves the caller's session conf untouched") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val sfDir = "/root/testdata/sf0.001"
    val out = StreamAnalytics.dailyTypeRollup(spark, sfDir)
    assert(out.count() > 0)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }
}
