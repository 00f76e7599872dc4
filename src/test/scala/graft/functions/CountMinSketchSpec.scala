package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CountMinSketch._

/** Count-Min sketch: exact in the sparse regime, one-sided error in the
  * dense regime, merge == single-pass, partition-count independent.
  */
class CountMinSketchSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def zipfIds(n: Int): Seq[Long] =
    (0 until n).map(i => (math.pow(i % 997 + 1, 0.5) * 7 % 200).toLong)

  test("sparse regime: every estimate is the exact count (long and string keys)") {
    val ids = zipfIds(20000)
    val exact = ids.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sk = ids.toDF("id").agg(cms_sketch(col("id")).as("s"))
      .head().getAs[Array[Byte]]("s")
    assert(cmsIsExact(sk))
    assert(cmsTotal(sk) == ids.size.toLong)
    exact.foreach { case (k, c) => assert(cmsEstimateLong(sk, k) == c) }
    assert(cmsEstimateLong(sk, 99999L) == 0L)

    val ssk = ids.map(i => s"k$i").toDF("id").agg(cms_sketch(col("id")).as("s"))
      .head().getAs[Array[Byte]]("s")
    exact.foreach { case (k, c) => assert(cmsEstimateString(ssk, s"k$k") == c) }
  }

  test("int-keyed sketches probe through cmsEstimateInt (hash family matches the build side)") {
    val ids = zipfIds(20000).map(_.toInt)
    val exact = ids.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val isk = ids.toDF("id").agg(cms_sketch(col("id")).as("s"))
      .head().getAs[Array[Byte]]("s")
    assert(cmsIsExact(isk))
    exact.foreach { case (k, c) => assert(cmsEstimateInt(isk, k) == c) }
    assert(cmsEstimateInt(isk, 99999) == 0L)
    // the long probe hashes differently and must NOT be used for int
    // builds — this documents the mismatch the int probe exists to avoid
    assert(exact.exists { case (k, _) => cmsEstimateLong(isk, k.toLong) != exact(k) })

    // dense regime: the int probe still lands in the build-side buckets
    val dsk = ids.toDF("id")
      .agg(cms_sketch(col("id"), depth = 4, width = 256, capacity = 16).as("s"))
      .head().getAs[Array[Byte]]("s")
    assert(!cmsIsExact(dsk))
    exact.foreach { case (k, c) => assert(cmsEstimateInt(dsk, k) >= c) }
  }

  test("dense regime: never underestimates, εN bound holds, densify preserves counts") {
    // capacity 16 forces densification; width 256 → ε = e/256
    val ids = zipfIds(20000)
    val exact = ids.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sk = ids.toDF("id")
      .agg(cms_sketch(col("id"), depth = 4, width = 256, capacity = 16).as("s"))
      .head().getAs[Array[Byte]]("s")
    assert(!cmsIsExact(sk))
    assert(cmsTotal(sk) == ids.size.toLong)
    val eps = math.E / 256
    exact.foreach { case (k, c) =>
      val est = cmsEstimateLong(sk, k)
      assert(est >= c, s"CMS underestimated key $k: $est < $c")
      assert(est <= c + (eps * ids.size * 4).toLong,
        s"CMS error way out of bound for $k: $est vs $c")
    }
  }

  test("merge across partition layouts equals the single-pass sketch") {
    val ids = zipfIds(20000)
    def sketch(parts: Int): Array[Byte] =
      spark.createDataset(ids).repartition(parts).toDF("id")
        .agg(cms_sketch(col("id"), depth = 4, width = 256, capacity = 16).as("s"))
        .head().getAs[Array[Byte]]("s")
    val a = sketch(1)
    val b = sketch(13)
    // dense counter matrices are identical whatever the partial layout
    assert(java.util.Arrays.equals(a, b))
  }

  test("direct buffer merge: sparse+sparse, sparse+dense, dense+dense agree with one pass") {
    val xs = (0L until 100L) ++ (0L until 50L)
    def buf(cap: Int, items: Seq[Long]): CmsBuffer = {
      val b = new CmsBuffer(4, 64, cap)
      items.foreach(i => b.add(FrequencySketches.hashValue(i, 0x7F4A7C15L), 1L))
      b
    }
    val one = buf(10, xs) // densified single pass
    val l = buf(10, xs.take(75))
    val r = buf(200, xs.drop(75)) // stays sparse
    l.mergeFrom(r)
    assert(java.util.Arrays.equals(CmsBuffer.toBytes(one), CmsBuffer.toBytes(l)))

    val sl = buf(200, xs.take(75))
    val sr = buf(200, xs.drop(75))
    sl.mergeFrom(sr)
    assert(sl.isExact)
    xs.distinct.foreach { k =>
      val h = FrequencySketches.hashValue(k, 0x7F4A7C15L)
      assert(sl.estimate(h) == xs.count(_ == k).toLong)
    }
  }
}
