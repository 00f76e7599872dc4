package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Region/range semantics ported from the reference's range tests
  * (java/core/src/test/java/sleeper/core/range/).
  */
class RegionSpec extends AnyFunSuite {

  test("canonicalization: exclusive min / inclusive max bump discrete types") {
    val r = KeyRange("k", Some(5L), minInclusive = false, Some(10L), maxInclusive = true).canonical
    assert(r.min.contains(6L) && r.minInclusive)
    assert(r.max.contains(11L) && !r.maxInclusive)

    val s = KeyRange("k", Some("a"), minInclusive = false, Some("b"), maxInclusive = true).canonical
    assert(s.min.contains("a\u0000"))
    assert(s.max.contains("b\u0000"))

    val b = KeyRange("k", Some(Array[Byte](1)), minInclusive = false,
      Some(Array[Byte](2)), maxInclusive = true).canonical
    assert(b.min.get.asInstanceOf[Array[Byte]].sameElements(Array[Byte](1, 0)))
    assert(b.max.get.asInstanceOf[Array[Byte]].sameElements(Array[Byte](2, 0)))
  }

  test("canonical form is identity on already-canonical ranges") {
    val r = KeyRange.minMax("k", 5L, 10L)
    assert(r.canonical == r)
  }

  test("exact range contains exactly the point") {
    val r = KeyRange.exact("k", 7L).canonical
    assert(r.min.contains(7L) && r.max.contains(8L))
  }

  test("overlap: adjacent canonical ranges do not overlap") {
    assert(!KeyRange.minMax("k", 0L, 5L).overlaps(KeyRange.minMax("k", 5L, 10L)))
    assert(KeyRange.minMax("k", 0L, 6L).overlaps(KeyRange.minMax("k", 5L, 10L)))
    assert(KeyRange.unbounded("k").overlaps(KeyRange.minMax("k", 5L, 10L)))
    assert(KeyRange.atLeast("k", 10L).overlaps(KeyRange.minMax("k", 5L, 11L)))
    assert(!KeyRange.atLeast("k", 11L).overlaps(KeyRange.minMax("k", 5L, 11L)))
  }

  test("overlap property: symmetric and consistent with interval math (seeded random)") {
    val rnd = new Random(42)
    (1 to 500).foreach { _ =>
      def range(): KeyRange = {
        val a = rnd.nextLong() % 100
        KeyRange.minMax("k", a, a + 1 + rnd.nextInt(50))
      }
      val (r1, r2) = (range(), range())
      val expected = {
        val (a1, b1) = (r1.min.get.asInstanceOf[Long], r1.max.get.asInstanceOf[Long])
        val (a2, b2) = (r2.min.get.asInstanceOf[Long], r2.max.get.asInstanceOf[Long])
        math.max(a1, a2) < math.min(b1, b2)
      }
      assert(r1.overlaps(r2) == expected, s"$r1 vs $r2")
      assert(r1.overlaps(r2) == r2.overlaps(r1))
    }
  }

  test("multidimensional region overlap requires overlap on every shared dimension") {
    val a = Region(KeyRange.minMax("x", 0L, 10L), KeyRange.minMax("y", 0L, 10L))
    val b = Region(KeyRange.minMax("x", 5L, 15L), KeyRange.minMax("y", 20L, 30L))
    val c = Region(KeyRange.minMax("x", 5L, 15L), KeyRange.minMax("y", 5L, 30L))
    assert(!a.overlaps(b))
    assert(a.overlaps(c))
  }

  test("toColumn filters a DataFrame to the region") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = (0L until 20L).map(i => (i, s"v$i")).toDF("k", "v")
    val got = df.filter(Region(KeyRange.minMax("k", 5L, 10L)).toColumn)
      .select("k").as[Long].collect().sorted
    assert(got.sameElements(Array(5L, 6L, 7L, 8L, 9L)))
  }
}
