package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The three scale-join operators, each checked against the naive plan
  * it replaces (per-row lookup / inequality cross / plain join).
  */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- AsofJoin -----------------------------------------------------

  test("asof join picks the latest right row at or before each left time") {
    val left = Seq(
      (1L, "u1", 100L, "p1"),
      (2L, "u1", 200L, "p2"),
      (3L, "u2", 50L, "p3"),
      (4L, "u3", 10L, "p4") // u3 has no right rows at all
    ).toDF("event_id", "user", "t", "tag")
    val right = Seq(
      (11L, "u1", 90L, 0.5),
      (12L, "u1", 100L, 1.5),  // ties left #1's time: <= bound, so it matches
      (13L, "u1", 150L, 2.5),
      (14L, "u2", 60L, 3.5)    // after u2's only left row: must NOT match
    ).toDF("event_id", "user", "t", "v")

    val out = AsofJoin.asof(left, right, "user", "t",
        payloadCols = Seq("event_id", "v"), tieBreakCol = "event_id")
      .select("event_id", "asof_event_id", "asof_v")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(out(1L) == (Some(12L), Some(1.5)))  // equal-time right row wins
    assert(out(2L) == (Some(13L), Some(2.5)))  // latest preceding
    assert(out(3L) == (None, None))            // right row is in the future
    assert(out(4L) == (None, None))            // no right rows for the key
  }

  test("asof join ties among right rows resolve to the greatest tiebreak") {
    val left = Seq((1L, "u", 100L)).toDF("event_id", "user", "t")
    val right = Seq((5L, "u", 90L, "a"), (7L, "u", 90L, "b"), (6L, "u", 90L, "c"))
      .toDF("event_id", "user", "t", "tag")
    val out = AsofJoin.asof(left, right, "user", "t", Seq("tag"), "event_id")
      .select("asof_tag").as[String].collect()
    assert(out.toSeq == Seq("b")) // event_id 7 is the greatest at t=90
  }

  test("asof join carries a null payload FIELD from the matched row") {
    // The matched right row legitimately has v = null: the join must
    // report null, not resurrect an older row's non-null v.
    val left = Seq((1L, "u", 100L)).toDF("event_id", "user", "t")
    val right = Seq(
      (5L, "u", 80L, Some(1.0)),
      (6L, "u", 90L, None: Option[Double])
    ).toDF("event_id", "user", "t", "v")
    val out = AsofJoin.asof(left, right, "user", "t", Seq("event_id", "v"), "event_id")
      .select("asof_event_id", "asof_v").collect().head
    assert(out.getLong(0) == 6L && out.isNullAt(1))
  }

  test("asof join matches the per-key window reference on random data") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i => (i.toLong, s"u${rnd.nextInt(10)}", rnd.nextInt(1000).toLong))
      .toDF("event_id", "user", "t")
    val right = (1001 to 1400).map(i => (i.toLong, s"u${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .toDF("event_id", "user", "t", "v")

    val got = AsofJoin.asof(left, right, "user", "t", Seq("event_id"), "event_id")
      .select("event_id", "asof_event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    // reference: argmax over (t, event_id) of right rows with t <= left.t
    val rightRows = right.collect().map(r => (r.getString(1), r.getLong(2), r.getLong(0)))
    val expect = left.collect().map { r =>
      val (id, u, tl) = (r.getLong(0), r.getString(1), r.getLong(2))
      val m = rightRows.filter(x => x._1 == u && x._2 <= tl)
      id -> (if (m.isEmpty) -1L else m.maxBy(x => (x._2, x._3))._3)
    }.toMap
    assert(got == expect)
  }

  // ---- RangeJoin ----------------------------------------------------

  test("binned range join equals the inequality cross join, at several bin widths") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 500).map(i => (i.toLong, rnd.nextDouble() * 1000 - 200))
      .toDF("pid", "x")
    val intervals = (1 to 80).map { i =>
      val lo = rnd.nextDouble() * 1000 - 200
      (i.toLong, lo, lo + rnd.nextDouble() * 120)
    }.toDF("iid", "lo", "hi")

    val expect = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.nonEmpty)
    for (w <- Seq(10.0, 64.0, 300.0)) {
      val got = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect, s"binWidth=$w")
    }
  }

  test("binned range join emits no duplicate pairs and drops empty intervals") {
    val points = Seq((1L, 5.0), (2L, 5.0)).toDF("pid", "x")
    val intervals = Seq((1L, 0.0, 100.0), (2L, 10.0, 9.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", 1.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // interval 1 spans 101 bins; each point still pairs with it exactly once
    assert(got.sorted.toSeq == Seq((1L, 1L), (2L, 1L)))
  }

  // ---- SkewJoin -----------------------------------------------------

  test("salted join equals the plain join, including a hot key") {
    val fact = ((1 to 2000).map(i => (42L, i.toLong)) ++ // hot key
        (1 to 500).map(i => (i.toLong % 20, 10000L + i)))
      .toDF("k", "row_id")
    val dim = (0L to 60L).map(k => (k, s"d$k")).toDF("dk", "name")

    val expect = fact.join(dim, $"k" === $"dk").groupBy("name")
      .count().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = SkewJoin.salted(fact, dim, (f, d) => f("k") === d("dk"),
        saltFrom = fact("row_id"), salts = 8)
      .groupBy("name").count().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("salting spreads a hot key across all salt values") {
    val fact = (1 to 4000).map(i => (42L, i.toLong)).toDF("k", "row_id")
    val salts = fact.withColumn("s", pmod(xxhash64($"row_id"), lit(8)))
      .groupBy("s").count().collect()
    assert(salts.length == 8 && salts.map(_.getLong(1)).min > 200)
  }

  test("hotSplit join equals the plain join at every head size") {
    // Zipf-ish fact: key k appears ~3000/k times; one-row-per-key dim
    val fact = (1 to 30).flatMap(k => (1 to 3000 / k).map(i => (s"k$k", i.toLong)))
      .toDF("key", "row_id")
    val dim = (1 to 30).map(k => (s"k$k", k.toLong * 10)).toDF("key", "payload")
    val expect = fact.join(dim, Seq("key"))
      .groupBy("key").agg(count(lit(1)).as("n"), sum("payload").as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // head smaller than / equal to / larger than the key space, and 0
    // (degrades to the plain join)
    for (h <- Seq(0, 5, 30, 100)) {
      val got = SkewJoin.hotSplit(fact, dim, "key", hotBy = dim("payload"), hotKeys = h)
        .groupBy("key").agg(count(lit(1)).as("n"), sum("payload").as("p"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"hotKeys=$h")
    }
  }

  test("hotSplit resolves head keys via broadcast (no shuffle for the hot side)") {
    val fact = (1 to 2000).map(i => ("hot", i.toLong)).toDF("key", "row_id")
    val dim = Seq(("hot", 1L), ("cold", 2L)).toDF("key", "payload")
    val plan = SkewJoin.hotSplit(fact, dim, "key", hotBy = dim("payload"), hotKeys = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"head keys must resolve via broadcast:\n$plan")
  }

  test("sketch-elected head: profileHeadKeys finds the true Zipf head in one pass") {
    // the fact's OWN skew decides, no dim-side count proxy needed
    val fact = (1 to 40).flatMap(k => (1 to 4000 / (k * k)).map(i => (s"k$k", i.toLong)))
      .toDF("key", "row_id")
    val exactTop = fact.groupBy("key").count()
      .orderBy($"count".desc, $"key").limit(5)
      .collect().map(_.getString(0)).toSet
    val elected = SkewJoin.profileHeadKeys(fact, "key", hotKeys = 5, capacity = 64)
      .map(_.asInstanceOf[String]).toSet
    assert(elected == exactTop,
      s"MG election $elected must match the exact top-5 $exactTop " +
        "(capacity >> head: every high-frequency key is retained)")
  }

  test("hotSplitProfiled equals the plain join and the exact-count decision") {
    val fact = (1 to 30).flatMap(k => (1 to 3000 / k).map(i => (s"k$k", i.toLong)))
      .toDF("key", "row_id")
    val dim = (1 to 30).map(k => (s"k$k", k.toLong * 10)).toDF("key", "payload")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("key").agg(count(lit(1)).as("n"), sum("payload").as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expect = agg(fact.join(dim, Seq("key")))
    for (h <- Seq(0, 5, 30, 100)) {
      val profiled = agg(SkewJoin.hotSplitProfiled(fact, dim, "key", hotKeys = h,
        capacity = 256))
      assert(profiled == expect, s"profiled hotKeys=$h")
      // the sketch-fed decision and the exact-count decision agree on
      // RESULTS for every head size (the split is correctness-neutral)
      val exact = agg(SkewJoin.hotSplit(fact, dim, "key",
        hotBy = dim("payload"), hotKeys = h))
      assert(profiled == exact, s"sketch vs exact decision, hotKeys=$h")
    }
    // and the elected head resolves via broadcast, like the exact head
    val plan = SkewJoin.hotSplitProfiled(fact, dim, "key", hotKeys = 5, capacity = 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"elected head must resolve via broadcast:\n$plan")
  }
}
