package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface: every custom kernel callable from pure SQL
  * after registration, matching the Column-API results.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    GraftExtensions.register(s)
    s
  }
  import spark.implicits._

  test("scalar kernels are callable from SQL") {
    val row = spark.sql(
      """SELECT cosine_sim(array(3.0F, 4.0F), array(4.0F, 3.0F)) AS cs,
        |       dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dp,
        |       rolling_hash('abc') AS rh,
        |       size(word_shingle_set('a b c d', 2)) AS ws,
        |       simhash64(array('x', 'y')) AS sh
        |""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 24.0 / 25.0) < 1e-9)
    assert(row.getDouble(1) == 11.0)
    // rolling hash of "abc" = ((97*31 + 98)*31 + 99) mod 1e9+7
    assert(row.getLong(2) == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
    assert(row.getInt(3) == 3)
    // matches the Column API
    val viaColumn = Seq(Seq("x", "y")).toDF("t")
      .select(graft.functions.HashExpressions.simhash64($"t")).as[Long].head()
    assert(row.getLong(4) == viaColumn)
  }

  test("aggregate kernels are callable from SQL (map_sum, sketch_agg)") {
    Seq(("k", Map("a" -> 1L)), ("k", Map("a" -> 2L, "b" -> 5L)))
      .toDF("key", "m").createOrReplaceTempView("ext_t")
    val m = spark.sql("SELECT map_sum(m) AS m FROM ext_t GROUP BY key")
      .as[Map[String, Long]].head()
    assert(m == Map("a" -> 3L, "b" -> 5L))

    spark.range(1, 1001).selectExpr("id").createOrReplaceTempView("ext_n")
    val sk = spark.sql("SELECT sketch_agg(id) AS s FROM ext_n").as[Array[Byte]].head()
    val sketch = graft.functions.KeySketch.deserialize(graft.functions.KeySketch.LongKind, sk)
    assert(sketch.getN == 1000)
  }

  test("frequency sketches and word_ngrams are callable from SQL") {
    spark.range(0, 500).selectExpr("id % 50 AS k").createOrReplaceTempView("ext_f")
    val nd = spark.sql("SELECT kmv_distinct(k) AS nd FROM ext_f").as[Long].head()
    assert(nd == 50, s"exact regime must report the true distinct count, got $nd")
    val hh = spark.sql(
      "SELECT heavy_hitters(k, 8) AS hh FROM (SELECT CASE WHEN id < 900 THEN 0 ELSE id END AS k FROM range(1000))")
      .selectExpr("hh[0].item AS item", "hh[0].count AS cnt").as[(Long, Long)].head()
    assert(hh._1 == 0L && hh._2 >= 900 - 1000 / 9,
      s"the dominant key must surface with the MG bound, got $hh")
    val sk = spark.sql("SELECT kmv_sketch(k) AS s FROM ext_f").as[Array[Byte]].head()
    assert(graft.functions.FrequencySketches.kmvEstimate(sk) == 50)
    val ng = spark.sql("SELECT word_ngrams('a b a b', 2) AS g").as[Seq[String]].head()
    assert(ng == Seq("a b", "b a", "a b"))
  }

  test("cms_sketch and sq8 functions are callable from SQL") {
    val cms = spark.sql(
      "SELECT cms_sketch(id % 10) AS s FROM range(1000)").as[Array[Byte]].head()
    assert(graft.functions.CountMinSketch.cmsIsExact(cms))
    assert(graft.functions.CountMinSketch.cmsEstimateLong(cms, 3L) == 100L)
    val dot = spark.sql(
      """SELECT sq8_dot(sq8_encode(array(1.0D, -1.0D)), sq8_encode(array(1.0D, 1.0D))) AS d,
        |       sq8_scale(array(2.0D, 0.0D)) AS s""".stripMargin)
      .as[(Long, Double)].head()
    assert(dot._1 == 0L, s"(127,-127)·(127,127) must cancel, got ${dot._1}")
    assert(dot._2 == 63.5)
    val ham = spark.sql(
      """SELECT bq_hamming(bq_encode(array(1.0D, -1.0D, 1.0D)),
        |                  bq_encode(array(1.0D, 1.0D, -1.0D))) AS h""".stripMargin)
      .as[Long].head()
    assert(ham == 2L)
  }

  test("hyperplane_lsh and minhash/band functions work with literal params") {
    val sig = spark.sql(
      "SELECT hyperplane_lsh(array(1.0F, -1.0F), 8, 3) AS s").as[Long].head()
    val viaColumn = Seq(Array(1f, -1f)).toDF("v")
      .select(graft.functions.VectorExpressions.hyperplane_lsh($"v", 8, 3L)).as[Long].head()
    assert(sig == viaColumn)

    val bands = spark.sql(
      "SELECT band_hashes(minhash_signature(array('a b', 'b c'), 8), 4, 2) AS b")
      .as[Seq[Long]].head()
    assert(bands.size == 4)
  }
}
