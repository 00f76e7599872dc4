package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference interleave: one bit at a time. */
  private def naive(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 32)
      z |= ((x >>> i) & 1L) << (2 * i) | ((y >>> i) & 1L) << (2 * i + 1)
    z
  }

  test("encode matches the bit-by-bit reference interleave") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val x = rnd.nextLong() & 0xFFFFFFFFL
      val y = rnd.nextLong() & 0xFFFFFFFFL
      assert(ZOrder.encode(x, y) == naive(x, y), s"x=$x y=$y")
    }
    assert(ZOrder.encode(0, 0) == 0L)
    assert(ZOrder.encode(0xFFFFFFFFL, 0xFFFFFFFFL) == -1L) // all 64 bits set
  }

  test("zvalue Column agrees with driver-side encode") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextLong() & 0xFFFFFFFFL, rnd.nextLong() & 0xFFFFFFFFL))
    val got = rows.toDF("x", "y")
      .select(ZOrder.zvalue($"x", $"y").as("z"), $"x", $"y")
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) == ZOrder.encode(r.getLong(1), r.getLong(2)))
    }
  }

  test("ranges exactly cover random boxes given ample budget") {
    val bits = 6 // 64×64 grid — exhaustive check is cheap
    val n = 1L << bits
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 50) {
      val x0 = rnd.nextInt(n.toInt).toLong; val x1 = x0 + rnd.nextInt((n - x0).toInt)
      val y0 = rnd.nextInt(n.toInt).toLong; val y1 = y0 + rnd.nextInt((n - y0).toInt)
      val rs = ZOrder.ranges(x0, x1, y0, y1, bits, maxRanges = 100000)
      def covered(z: Long) = rs.exists { case (lo, hi) => z >= lo && z <= hi }
      for (x <- 0L until n; y <- 0L until n) {
        val in = x >= x0 && x <= x1 && y >= y0 && y <= y1
        assert(covered(ZOrder.encode(x, y)) == in,
          s"box=[$x0,$x1]x[$y0,$y1] cell=($x,$y)")
      }
      // sorted + disjoint
      rs.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 < l2)
        case _ =>
      }
    }
  }

  test("ranges under a tight budget still cover the box, never lose cells") {
    val bits = 8
    val n = 1L << bits
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 30) {
      val x0 = rnd.nextInt(n.toInt).toLong; val x1 = x0 + rnd.nextInt((n - x0).toInt)
      val y0 = rnd.nextInt(n.toInt).toLong; val y1 = y0 + rnd.nextInt((n - y0).toInt)
      val rs = ZOrder.ranges(x0, x1, y0, y1, bits, maxRanges = 8)
      def covered(z: Long) = rs.exists { case (lo, hi) => z >= lo && z <= hi }
      for (x <- x0 to x1; y <- y0 to y1)
        assert(covered(ZOrder.encode(x, y)), s"lost cell ($x,$y)")
      // the budget bound is approximate but must stay the same order
      assert(rs.size <= 8 + 4 * bits, s"ranges=${rs.size}")
    }
  }

  test("a box much smaller than the domain covers a small z fraction") {
    val bits = 16
    // 1% of each dimension
    val rs = ZOrder.ranges(1000, 1655, 20000, 20655, bits, maxRanges = 64)
    val volume = rs.map { case (lo, hi) => hi - lo + 1 }.sum.toDouble
    val domain = math.pow(2, 2 * bits)
    // exact box volume is 656² ≈ 1e-4 of the domain; the budgeted cover
    // must stay within ~50× of it (still a ~200× scan reduction)
    assert(volume / domain < 0.005, s"cover fraction ${volume / domain}")
  }
}
