package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FrequencySketches.{heavy_hitters, kmv_distinct}

/** Semantics of the one-pass frequency/cardinality sketches: exactness
  * below capacity (the oracle-checked regime), estimator error and the
  * Misra-Gries containment guarantee past it, and mergeability across
  * many partitions (the property that makes them one-pass at scale).
  */
class FrequencySketchesSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("kmv_distinct is exact below capacity, grouped and global") {
    val df = (0 until 10000).map(i => (i % 7, (i % 931).toLong)).toDF("g", "k")
      .repartition(16)
    val got = df.groupBy("g").agg(kmv_distinct($"k", 4096).as("nd"))
      .orderBy("g").as[(Int, Long)].collect()
    val exact = df.groupBy("g").agg(countDistinct($"k").as("nd"))
      .orderBy("g").as[(Int, Long)].collect()
    assert(got.sameElements(exact))
    val global = df.agg(kmv_distinct($"k", 4096)).as[Long].head()
    assert(global == 931L)
  }

  test("kmv_distinct string keys are exact below capacity") {
    val df = (0 until 5000).map(i => s"key-${i % 800}").toDF("k").repartition(8)
    assert(df.agg(kmv_distinct($"k", 1024)).as[Long].head() == 800L)
  }

  test("kmv_distinct estimates within ~3/sqrt(k) past capacity") {
    val n = 200000
    val df = (0 until n).map(_.toLong).toDF("k").repartition(32)
    val k = 1024
    val est = df.agg(kmv_distinct($"k", k)).as[Long].head()
    val rel = math.abs(est - n.toDouble) / n
    assert(rel < 3.0 / math.sqrt(k.toDouble), s"estimate $est for $n distinct (rel err $rel)")
  }

  test("heavy_hitters is exact below capacity and ordered (count desc, item asc)") {
    // key i appears (i+1) times, i in 0..99 — distinct 100 < capacity
    val rows = (0 until 100).flatMap(i => Seq.fill(i + 1)(i.toLong))
    val df = rows.toDF("k").repartition(16)
    val hh = df.agg(heavy_hitters($"k", 256).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item".as("item"), $"e.count".as("cnt"))
      .as[(Long, Long)].collect()
    assert(hh.length == 100)
    assert(hh.head == ((99L, 100L)), s"top is ${hh.head}")
    assert(hh.last == ((0L, 1L)))
    // total order: count desc, then item asc on ties (no ties here, so
    // check monotone counts + a tie fixture separately)
    assert(hh.sliding(2).forall { case Array(a, b) => a._2 >= b._2 })
    val ties = Seq("b", "a", "c", "a", "b", "c").toDF("k")
      .agg(heavy_hitters($"k", 16).as("hh"))
      .select(explode($"hh").as("e")).select($"e.item".as("i"))
      .as[String].collect()
    assert(ties.toSeq == Seq("a", "b", "c"), "equal counts break ties by item asc")
  }

  test("heavy_hitters past capacity: true heavies survive with bounded undercount") {
    // 3 heavy keys at 5000 each + 10000 singletons; capacity 64.
    // MG guarantee: any key with true frequency > total/(capacity+1)
    // is present, and counts undercount by at most total/(capacity+1).
    val total = 3 * 5000 + 10000
    val bound = total / 65
    val rows = (0 until 3).flatMap(h => Seq.fill(5000)(s"heavy$h")) ++
      (0 until 10000).map(i => s"one$i")
    val df = scala.util.Random.shuffle(rows).toDF("k").repartition(32)
    val hh = df.agg(heavy_hitters($"k", 64).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item".as("item"), $"e.count".as("cnt"))
      .as[(String, Long)].collect().toMap
    (0 until 3).foreach { h =>
      val got = hh.getOrElse(s"heavy$h", 0L)
      assert(got > 0, s"heavy$h missing (bound $bound, sketch: ${hh.take(5)})")
      assert(got <= 5000 && got >= 5000 - bound,
        s"heavy$h count $got outside [${5000 - bound}, 5000]")
    }
  }

  test("heavy_hitters head feeds SkewJoin.hotSplit: equal to the plain join") {
    // Zipf-ish fact: key 0 takes half the rows; dim is one row per key.
    val fact = ((0 until 5000).map(_ => 0L) ++ (0 until 5000).map(i => (i % 97 + 1).toLong))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "payload")
    val dim = (0L to 97L).map(k => (k, s"dim$k")).toDF("key", "name")
    val hot = fact.agg(heavy_hitters($"key", 256).as("hh"))
      .select(explode($"hh").as("e")).select($"e.item".as("key"), $"e.count".as("cnt"))
      .limit(8)
    val hotDim = dim.join(hot.select("key", "cnt"), Seq("key"))
    val split = graft.operators.SkewJoin.hotSplit(
      fact, dim.join(hotDim.select($"key", $"cnt"), Seq("key"), "left")
        .select(dim.columns.map(col) :+ coalesce($"cnt", lit(0L)).as("__w"): _*),
      "key", hotBy = col("__w"), hotKeys = 8)
      .drop("__w")
    val plain = fact.join(dim, Seq("key"))
    assert(split.count() == plain.count())
    assert(split.exceptAll(plain).isEmpty && plain.exceptAll(split).isEmpty)
  }

  test("serialization round-trips both sketch buffers") {
    val kmvAgg = KmvDistinctAgg(org.apache.spark.sql.graft.bridge.expression(lit(1L)), 64)
    val kb = new KmvBuffer(64)
    (0 until 100).foreach(i => kb.add(FrequencySketches.hashValue(i.toLong, 7L)))
    val kb2 = kmvAgg.deserialize(kmvAgg.serialize(kb))
    assert(kb2.k == kb.k && kb2.set.equals(kb.set) && kb2.estimate == kb.estimate)

    val mgAgg = HeavyHittersAgg(org.apache.spark.sql.graft.bridge.expression(lit("x")), 16)
    val mb = new MgBuffer(16)
    mb.add(org.apache.spark.unsafe.types.UTF8String.fromString("a"), 3L)
    mb.add(7L, 2L)
    mb.add(5, 1L)
    val mb2 = mgAgg.deserialize(mgAgg.serialize(mb))
    assert(mb2.counts.equals(mb.counts))
  }

  test("hll_distinct holds its error bound across cardinality regimes") {
    import graft.functions.FrequencySketches.hll_distinct
    // p=14 => ~0.81% standard error; assert 5% (6+ sigma), both in the
    // linear-counting regime (small n) and the raw-estimate regime
    for (n <- Seq(100, 5000, 200000)) {
      val df = (0 until n).map(i => i.toLong).toDF("k").repartition(16)
      val est = df.agg(hll_distinct($"k")).as[Long].head()
      assert(math.abs(est - n).toDouble / n <= 0.05,
        s"hll estimate $est for true $n breaches the 5% gate")
    }
    // string keys ride the same path
    val sdf = (0 until 20000).map(i => s"doc-${i % 9321}").toDF("k").repartition(8)
    val sEst = sdf.agg(hll_distinct($"k")).as[Long].head()
    assert(math.abs(sEst - 9321).toDouble / 9321 <= 0.05)
  }

  test("hll merge across partitions equals the single-partition build; unions compose") {
    import graft.functions.FrequencySketches._
    val df = (0 until 50000).map(i => (i % 17000).toLong).toDF("k")
    val one = df.coalesce(1).agg(hll_distinct($"k")).as[Long].head()
    val many = df.repartition(32).agg(hll_distinct($"k")).as[Long].head()
    assert(one == many, "register-max merge must be partitioning-independent")

    // union of two disjoint halves' sketches ~ the full build
    val skA = df.filter($"k" < 8500).agg(hll_sketch($"k")).head().getAs[Array[Byte]](0)
    val skB = df.filter($"k" >= 8500).agg(hll_sketch($"k")).head().getAs[Array[Byte]](0)
    val union = hllUnionEstimate(skA, skB)
    assert(math.abs(union - 17000).toDouble / 17000 <= 0.05)
    assert(hllEstimate(skA) < hllEstimate(skB) * 2) // sanity: halves comparable

    // serialization round-trip preserves the registers exactly
    val hb = new HllBuffer(12)
    (0 until 1000).foreach(i => hb.add(FrequencySketches.hashValue(i.toLong, 7L)))
    val hb2 = HllBuffer.fromBytes(HllBuffer.toBytes(hb))
    assert(hb2.p == hb.p && java.util.Arrays.equals(hb2.registers, hb.registers))
  }

  test("hll_distinct is callable from SQL after registration") {
    graft.GraftExtensions.register(spark)
    (0 until 3000).map(i => (i % 7, (i % 1234).toLong)).toDF("g", "k")
      .createOrReplaceTempView("hll_in")
    val rows = spark.sql(
      "SELECT g, hll_distinct(k) AS nd FROM hll_in GROUP BY g ORDER BY g")
      .as[(Int, Long)].collect()
    assert(rows.length == 7)
    rows.foreach { case (_, nd) =>
      assert(nd > 0 && math.abs(nd - 1234.0 / 7 * 7 / 7) < 1234) // bounded sanity
    }
    val global = spark.sql("SELECT hll_distinct(k) FROM hll_in").as[Long].head()
    assert(math.abs(global - 1234).toDouble / 1234 <= 0.05)
  }
}
