package graft.vectors

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.functions.VectorExpressions._
import graft.functions.HashExpressions._
import graft.vectors.VectorFunctions

/** Semantics of the vector/hash kernels: cosine against hand-computed
  * values, LSH recall against the brute-force oracle, and
  * simhash/minhash invariants.
  */
class VectorsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def randomVectors(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new Random(seed)
    (0L until n).map { id =>
      id -> Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    }
  }

  test("cosine_sim matches hand-computed values (incl. float/double mix)") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 2f), Array(2f, 4f), 1.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0),
      (Array(3f, 4f), Array(4f, 3f), 24.0 / 25.0)
    ).toDF("a", "b", "expected")
    val rows = df.select(cosine_sim($"a", $"b").as("got"), $"expected")
      .as[(Double, Double)].collect()
    rows.foreach { case (got, exp) => assert(math.abs(got - exp) < 1e-6, s"$got vs $exp") }
    // double arrays too
    val d = Seq((Array(1.0, 1.0), Array(1.0, 0.0))).toDF("a", "b")
      .select(cosine_sim($"a", $"b")).as[Double].head()
    assert(math.abs(d - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("dot_product matches hand-computed values") {
    val got = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .select(dot_product($"a", $"b")).as[Double].head()
    assert(got == 32.0)
  }

  test("knnLsh recall vs knnBrute is high on clustered vectors") {
    // query vector + 30 near neighbours (small perturbations) + 200 noise
    val rnd = new Random(7)
    val dim = 64
    val q = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val near = (1L to 30L).map { id =>
      id -> q.map(x => x + (rnd.nextDouble() * 0.2 - 0.1).toFloat)
    }
    val noise = randomVectors(200, dim, seed = 11).map { case (id, v) => (id + 100L) -> v }
    val all = (near ++ noise).toDF("vec_id", "embedding")
    val queryDf = Seq(0L -> q).toDF("vec_id", "embedding")

    val brute = VectorFunctions.knnBrute(all, "vec_id", "embedding",
      queryDf, "embedding", k = 10).select("id").as[Long].collect().toSet
    val lsh = VectorFunctions.knnLsh(all, "vec_id", "embedding",
      queryDf, "embedding", k = 10).select("id").as[Long].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall too low; brute=$brute lsh=$lsh")
  }

  test("knnBruteBatch equals per-query knnBrute exactly, incl. tie ranks") {
    val all = randomVectors(300, 16, seed = 51).toDF("vec_id", "embedding")
    val queries = randomVectors(4, 16, seed = 53)
      .map { case (i, v) => (i + 9000L, v) }.toDF("vec_id", "embedding")
    val batch = VectorFunctions.knnBruteBatch(all, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 7)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    assert(batch.keySet == (9000L until 9004L).toSet)
    (9000L until 9004L).foreach { qid =>
      val single = VectorFunctions.knnBrute(all, "vec_id", "embedding",
          queries.filter($"vec_id" === qid), "embedding", k = 7)
        .as[(Long, Double)].collect().toSeq
      assert(batch(qid) == single, s"query $qid")
    }
    // partitioning independence: the map-side heaps must merge identically
    val repart = VectorFunctions.knnBruteBatch(all.repartition(7), "vec_id",
        "embedding", queries, "vec_id", "embedding", k = 7)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(repart == VectorFunctions.knnBruteBatch(all, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 7)
      .as[(Long, Long, Double, Long)].collect().toSet)
  }

  test("knnFiltered: selective path equals brute force over the filtered set") {
    val all = randomVectors(400, 32, seed = 5).toDF("vec_id", "embedding")
    val queryDf = Seq(9999L -> randomVectors(1, 32, seed = 6).head._2)
      .toDF("vec_id", "embedding")
    val allowed = all.filter(pmod($"vec_id", lit(3)) === 0).select("vec_id")
    val got = VectorFunctions.knnFiltered(all, "vec_id", "embedding",
        allowed, queryDf, "embedding", k = 10)
      .as[(Long, Double)].collect().toSeq
    val exp = VectorFunctions.knnBrute(
        all.filter(pmod($"vec_id", lit(3)) === 0), "vec_id", "embedding",
        queryDf, "embedding", k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == exp)
    assert(got.forall(_._1 % 3 == 0))
  }

  test("knnFiltered dense path: recall@10 >= 0.9 vs filtered brute on clustered data") {
    val rnd = new Random(23)
    val dim = 64
    val q = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    // 40 near-duplicates of the query (even ids pass the filter) + noise
    val near = (0L until 40L).map { i =>
      (1000L + i) -> q.map(x => x + (rnd.nextDouble() * 0.2 - 0.1).toFloat)
    }
    val noise = randomVectors(400, dim, seed = 29)
    val all = (near ++ noise).toDF("vec_id", "embedding")
    val allowed = all.filter(pmod($"vec_id", lit(2)) === 0).select("vec_id")
    val queryDf = Seq(9999L -> q).toDF("vec_id", "embedding")
    val brute = VectorFunctions.knnBrute(
        all.join(broadcast(allowed), Seq("vec_id"), "left_semi"),
        "vec_id", "embedding", queryDf, "embedding", k = 10)
      .select("id").as[Long].collect().toSet
    // bruteThreshold=0 forces the IVF path even on this small corpus
    val ivf = VectorFunctions.knnFiltered(all, "vec_id", "embedding",
        allowed, queryDf, "embedding", k = 10,
        bruteThreshold = 0, nCentroids = 16, nprobe = 6)
      .select("id").as[Long].collect().toSet
    assert(ivf.forall(_ % 2 == 0))
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall; brute=$brute ivf=$ivf")
  }

  test("knnIvfIndexFiltered serves the filter from the persisted lists") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-filt").toString
    val rnd = new Random(31)
    val dim = 32
    val q = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val near = (0L until 30L).map { i =>
      (500L + i) -> q.map(x => x + (rnd.nextDouble() * 0.2 - 0.1).toFloat)
    }
    val all = (near ++ randomVectors(300, dim, seed = 37)).toDF("vec_id", "embedding")
    VectorFunctions.buildIvfIndex(all, "vec_id", "embedding", dir, nCentroids = 8)
    val allowed = all.filter(pmod($"vec_id", lit(2)) === 0).select("vec_id")
    val queryDf = Seq(9999L -> q).toDF("vec_id", "embedding")
    val served = VectorFunctions.knnIvfIndexFiltered(spark, dir, allowed,
        queryDf, "embedding", k = 10, nprobe = 4)
      .select("id").as[Long].collect().toSet
    val brute = VectorFunctions.knnBrute(
        all.join(broadcast(allowed), Seq("vec_id"), "left_semi"),
        "vec_id", "embedding", queryDf, "embedding", k = 10)
      .select("id").as[Long].collect().toSet
    assert(served.forall(_ % 2 == 0))
    val recall = (brute intersect served).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall; brute=$brute served=$served")
  }

  test("knnIvfPqIndexFiltered: filter rides the codes scan; recall holds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-filt").toString
    val rnd = new Random(41)
    val dim = 32
    val q = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val near = (0L until 30L).map { i =>
      (600L + i) -> q.map(x => x + (rnd.nextDouble() * 0.2 - 0.1).toFloat)
    }
    val all = (near ++ randomVectors(300, dim, seed = 43)).toDF("vec_id", "embedding")
    VectorFunctions.buildIvfPqIndex(all, "vec_id", "embedding", dir,
      nCentroids = 8, m = 8, ksub = 16)
    val allowed = all.filter(pmod($"vec_id", lit(2)) === 0).select("vec_id")
    val queryDf = Seq(9999L -> q).toDF("vec_id", "embedding")
    val served = VectorFunctions.knnIvfPqIndexFiltered(spark, dir, allowed,
        queryDf, "embedding", k = 10, nprobe = 4, rerank = 64)
      .select("id").as[Long].collect().toSet
    val brute = VectorFunctions.knnBrute(
        all.join(broadcast(allowed), Seq("vec_id"), "left_semi"),
        "vec_id", "embedding", queryDf, "embedding", k = 10)
      .select("id").as[Long].collect().toSet
    assert(served.forall(_ % 2 == 0))
    val recall = (brute intersect served).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall; brute=$brute served=$served")
    // unfiltered serve is unchanged by the refactor
    val unf = VectorFunctions.knnIvfPqIndex(spark, dir, queryDf, "embedding",
      k = 10, nprobe = 4, rerank = 64).select("id").as[Long].collect()
    assert(unf.length == 10)
  }

  test("knnIvf recall vs knnBrute is high on clustered vectors") {
    val rnd = new Random(13)
    val dim = 64
    val q = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val near = (1L to 30L).map { id =>
      id -> q.map(x => x + (rnd.nextDouble() * 0.2 - 0.1).toFloat)
    }
    val noise = randomVectors(300, dim, seed = 17).map { case (id, v) => (id + 100L) -> v }
    val all = (near ++ noise).toDF("vec_id", "embedding")
    val queryDf = Seq(0L -> q).toDF("vec_id", "embedding")

    val brute = VectorFunctions.knnBrute(all, "vec_id", "embedding",
      queryDf, "embedding", k = 10).select("id").as[Long].collect().toSet
    val ivf = VectorFunctions.knnIvf(all, "vec_id", "embedding",
      queryDf, "embedding", k = 10, nCentroids = 16, nprobe = 6)
      .select("id").as[Long].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall too low; brute=$brute ivf=$ivf")
  }

  test("trained IVF: mean recall@10 >= 0.9 over a 20-query panel at nprobe=4") {
    // 16 true clusters of 25 points each; queries are perturbed members,
    // so the ground-truth neighbours concentrate in one trained cell —
    // exactly the regime IVF must win in. Train ONCE (the build-artifact
    // shape), serve all 20 queries from the trained matrix.
    val rnd = new Random(29)
    val dim = 64
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val points = (0 until 16).flatMap { c =>
      (0 until 25).map { i =>
        val id = (c * 25 + i).toLong
        id -> centers(c).map(x => (x + rnd.nextDouble() * 0.3 - 0.15).toFloat)
      }
    }
    val all = points.toDF("vec_id", "embedding")
    val cents = VectorFunctions.trainKmeansCentroids(all, "vec_id", "embedding", k = 16)
    assert(cents.length == 16)

    val recalls = (0 until 20).map { qi =>
      val base = points(rnd.nextInt(points.size))._2
      val qv = base.map(x => x + (rnd.nextDouble() * 0.05 - 0.025).toFloat)
      val queryDf = Seq((qi + 10000L) -> qv).toDF("vec_id", "embedding")
      val brute = VectorFunctions.knnBrute(all, "vec_id", "embedding",
        queryDf, "embedding", k = 10).select("id").as[Long].collect().toSet
      val ivf = VectorFunctions.knnIvfTrained(all, "vec_id", "embedding",
        queryDf, "embedding", k = 10, cents, nprobe = 4)
        .select("id").as[Long].collect().toSet
      (brute intersect ivf).size.toDouble / brute.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean across panel; per-query: $recalls")
  }

  test("persisted IVF index serves the same results and prunes to the probed cells") {
    val rnd = new Random(31)
    val dim = 32
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val points = (0 until 8).flatMap { c =>
      (0 until 40).map { i =>
        (c * 40 + i).toLong -> centers(c).map(x => (x + rnd.nextDouble() * 0.2 - 0.1).toFloat)
      }
    }
    val all = points.toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    VectorFunctions.buildIvfIndex(all, "vec_id", "embedding", idx, nCentroids = 8)

    val qv = points(100)._2.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
    val queryDf = Seq(9999L -> qv).toDF("vec_id", "embedding")

    val cents = spark.read.parquet(s"$idx/centroids").orderBy("cell").collect()
      .map(r => r.getAs[scala.collection.Seq[Double]]("centroid").toArray)
    val fromTrained = VectorFunctions.knnIvfTrained(all, "vec_id", "embedding",
      queryDf, "embedding", k = 10, cents, nprobe = 2)
      .select("id").as[Long].collect().toSeq
    val served = VectorFunctions.knnIvfIndex(spark, idx, queryDf, "embedding",
      k = 10, nprobe = 2)
    assert(served.select("id").as[Long].collect().toSeq == fromTrained)

    // physical partition pruning: rank the probe cells as the server
    // does, then prove at EXECUTION time that only those cells' files
    // are read (input_file_name over the identical pruned scan)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val qd = qv.map(_.toDouble)
    val probed = cents.zipWithIndex
      .map { case (cv, c) => (cos(qd, cv), c) }
      .sortBy { case (s, c) => (-s, c) }.take(2).map(_._2)
    val scannedCells = spark.read.parquet(s"$idx/lists")
      .filter($"cell".isin(probed: _*))
      .select(input_file_name()).distinct().as[String].collect()
      .flatMap(f => "cell=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt))
      .toSet
    assert(scannedCells == probed.toSet,
      s"scan must touch exactly the probed cell dirs: $scannedCells vs $probed")
  }

  test("incremental IVF append: recall@10 holds without rebuild; drift trips the re-train gate") {
    val rnd = new Random(57)
    val dim = 32
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    def near(c: Int, id: Long) =
      id -> centers(c).map(x => (x + rnd.nextDouble() * 0.2 - 0.1).toFloat)
    val initial = (0 until 8).flatMap(c => (0 until 30).map(i => near(c, c * 30 + i)))
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    VectorFunctions.buildIvfIndex(initial.toDF("vec_id", "embedding"), "vec_id", "embedding",
      idx, nCentroids = 8)

    // appended batch: same distribution, new ids — assigned to the
    // EXISTING centroids, resident lists untouched
    val appended = (0 until 8).flatMap(c => (0 until 10).map(i => near(c, 1000 + c * 10 + i)))
    VectorFunctions.appendToIvfIndex(appended.toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx)
    val everything = initial ++ appended
    assert(spark.read.parquet(s"$idx/lists").count() == everything.size)

    // recall@10 over a 10-query panel vs brute force on the FULL corpus
    // (old + appended), served from the appended index without rebuild
    val all = everything.toDF("vec_id", "embedding")
    val recalls = (0 until 10).map { qi =>
      val qv = everything(rnd.nextInt(everything.size))._2
        .map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
      val queryDf = Seq(9999L -> qv).toDF("vec_id", "embedding")
      val brute = VectorFunctions.knnBrute(all, "vec_id", "embedding",
        queryDf, "embedding", k = 10).select("id").as[Long].collect().toSet
      val served = VectorFunctions.knnIvfIndex(spark, idx, queryDf, "embedding",
        k = 10, nprobe = 4).select("id").as[Long].collect().toSet
      (brute intersect served).size.toDouble / brute.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 after append $mean; per-query: $recalls")
    // appended ids are actually servable (not just resident)
    val qNew = Seq(8888L -> everything.find(_._1 == 1000L).get._2)
      .toDF("vec_id", "embedding")
    assert(VectorFunctions.knnIvfIndex(spark, idx, qNew, "embedding", k = 1, nprobe = 2)
      .select("id").as[Long].head() == 1000L)

    // balanced appends keep the gate quiet
    val statsBefore = VectorFunctions.ivfIndexStats(spark, idx)
    assert(statsBefore.cells == 8 && statsBefore.totalVectors == everything.size)
    assert(!statsBefore.needsRetrain(), s"balanced index flagged: $statsBefore")

    // drift: a flood of vectors all landing in one cell skews occupancy
    // past the bound — the signal to re-train the quantizer
    val flood = (0 until 400).map(i => near(3, 5000 + i))
    VectorFunctions.appendToIvfIndex(flood.toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx)
    val statsAfter = VectorFunctions.ivfIndexStats(spark, idx)
    assert(statsAfter.needsRetrain(), s"drifted index not flagged: $statsAfter")
    assert(statsAfter.maxCell >= 400, s"flood cell not dominant: $statsAfter")
  }

  test("trainKmeansCentroids is deterministic across runs") {
    val all = randomVectors(200, 32, seed = 41).toDF("vec_id", "embedding")
    val a = VectorFunctions.trainKmeansCentroids(all, "vec_id", "embedding", k = 8)
    val b = VectorFunctions.trainKmeansCentroids(all, "vec_id", "embedding", k = 8)
    assert(a.length == 8)
    a.zip(b).foreach { case (x, y) => assert(java.util.Arrays.equals(x, y)) }
  }

  test("v4 driver-row preflight: trained IVF == brute top-5 on sf0.01 embeddings") {
    // The driver row's oracle is the exact brute-force top-5 for
    // vec_id 7 at nprobe=12; this replays that gate so a recall
    // regression is caught before the round's Verify run. (These
    // embeddings are near-random — the hard, barely-cell-local regime —
    // and the pin holds at both verified sfs: sf0.01 exact from
    // nprobe=4 up, sf0.1 from nprobe=10 up.)
    val dir = "/root/testdata/sf0.01/embeddings.parquet"
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val e = spark.read.parquet(dir)
    val brute = VectorFunctions.knnBrute(
      e.filter($"vec_id" =!= 7), "vec_id", "embedding",
      e.filter($"vec_id" === 7), "embedding", k = 5)
      .select("id").as[Long].collect().toSet
    val ivf = VectorFunctions.knnIvf(
      e.filter($"vec_id" =!= 7), "vec_id", "embedding",
      e.filter($"vec_id" === 7), "embedding", k = 5, nprobe = 12)
      .select("id").as[Long].collect().toSet
    assert(ivf == brute, s"IVF must reach exact recall on the driver query; " +
      s"missing=${brute diff ivf} extra=${ivf diff brute}")
  }

  test("PQ encode: m codes per vector, all < ksub, deterministic across runs") {
    val all = randomVectors(150, 64, seed = 61).toDF("vec_id", "embedding")
    val cb = VectorFunctions.trainPqCodebooks(all, "vec_id", "embedding", m = 8, ksub = 16)
    assert(cb.dsub == 8 && cb.dim == 64)
    val cb2 = VectorFunctions.trainPqCodebooks(all, "vec_id", "embedding", m = 8, ksub = 16)
    assert(cb == cb2, "training must be deterministic")
    val codes = VectorFunctions.pqEncodeAll(all, "vec_id", "embedding", cb)
      .as[(Long, Seq[Byte])].collect()
    assert(codes.length == 150)
    codes.foreach { case (id, cs) =>
      assert(cs.length == 8, s"vector $id encoded to ${cs.length} codes")
      cs.foreach(c => assert((c & 0xff) < 16, s"code $c out of range for ksub=16"))
    }
    // ADC of a vector against itself-as-query ranks it at/near the top:
    // the table bakes the query in, the codes select its own cells
    val q = codes.head._1
    val qRow = all.filter($"vec_id" === q)
    val top = VectorFunctions.knnPq(all.filter($"vec_id" =!= q), "vec_id", "embedding",
      qRow, "embedding", k = 1, cb, rerank = 16)
    assert(top.count() == 1)
  }

  test("PQ kNN: mean recall@10 >= 0.9 over a 20-query panel on clustered vectors") {
    val rnd = new Random(67)
    val dim = 64
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val points = (0 until 16).flatMap { c =>
      (0 until 25).map { i =>
        (c * 25 + i).toLong -> centers(c).map(x => (x + rnd.nextDouble() * 0.3 - 0.15).toFloat)
      }
    }
    val all = points.toDF("vec_id", "embedding")
    // train ONCE, serve the panel from the trained codebooks
    val cb = VectorFunctions.trainPqCodebooks(all, "vec_id", "embedding", m = 8, ksub = 16)
    val recalls = (0 until 20).map { qi =>
      val base = points(rnd.nextInt(points.size))._2
      val qv = base.map(x => x + (rnd.nextDouble() * 0.05 - 0.025).toFloat)
      val queryDf = Seq((qi + 10000L) -> qv).toDF("vec_id", "embedding")
      val brute = VectorFunctions.knnBrute(all, "vec_id", "embedding",
        queryDf, "embedding", k = 10).select("id").as[Long].collect().toSet
      val pq = VectorFunctions.knnPq(all, "vec_id", "embedding",
        queryDf, "embedding", k = 10, cb, rerank = 50)
        .select("id").as[Long].collect().toSet
      (brute intersect pq).size.toDouble / brute.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean across panel; per-query: $recalls")
  }

  test("v6 driver-row preflight: PQ+rerank == brute top-5 on sf0.01 embeddings") {
    // The driver row's oracle is the exact brute-force top-5 for
    // vec_id 11 at m=16, ksub=16, rerank=256; this replays that gate
    // (the v4 playbook) so a recall regression is caught before the
    // round's Verify run. (Near-random embeddings are the hard regime
    // for PQ: 4-bit subspace quantization buries the tiny cosine
    // spreads, so rerank absorbs the error — sf0.01 is exact from
    // rerank=32 up, sf0.1 from rerank=256.)
    val dir = "/root/testdata/sf0.01/embeddings.parquet"
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val e = spark.read.parquet(dir)
    val cb = VectorFunctions.trainPqCodebooks(
      e.filter($"vec_id" =!= 11), "vec_id", "embedding", m = 16, ksub = 16)
    val brute = VectorFunctions.knnBrute(
      e.filter($"vec_id" =!= 11), "vec_id", "embedding",
      e.filter($"vec_id" === 11), "embedding", k = 5)
      .select("id").as[Long].collect().toSet
    val pq = VectorFunctions.knnPq(
      e.filter($"vec_id" =!= 11), "vec_id", "embedding",
      e.filter($"vec_id" === 11), "embedding", k = 5, cb, rerank = 256)
      .select("id").as[Long].collect().toSet
    assert(pq == brute, s"PQ must reach exact recall on the driver query; " +
      s"missing=${brute diff pq} extra=${pq diff brute}")
  }

  test("IVF-PQ: mean recall@10 >= 0.9 over a 20-query panel; ADC reads only probed cells") {
    val rnd = new Random(71)
    val dim = 64
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val points = (0 until 16).flatMap { c =>
      (0 until 25).map { i =>
        (c * 25 + i).toLong -> centers(c).map(x => (x + rnd.nextDouble() * 0.3 - 0.15).toFloat)
      }
    }
    val all = points.toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-panel").toString
    VectorFunctions.buildIvfPqIndex(all, "vec_id", "embedding", idx,
      nCentroids = 16, m = 8, ksub = 16)

    val recalls = (0 until 20).map { qi =>
      val base = points(rnd.nextInt(points.size))._2
      val qv = base.map(x => x + (rnd.nextDouble() * 0.05 - 0.025).toFloat)
      val queryDf = Seq((qi + 10000L) -> qv).toDF("vec_id", "embedding")
      val brute = VectorFunctions.knnBrute(all, "vec_id", "embedding",
        queryDf, "embedding", k = 10).select("id").as[Long].collect().toSet
      val served = VectorFunctions.knnIvfPqIndex(spark, idx, queryDf, "embedding",
        k = 10, nprobe = 4, rerank = 50).select("id").as[Long].collect().toSet
      (brute intersect served).size.toDouble / brute.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean across panel; per-query: $recalls")

    // the approximate phase physically touches only the probed cells'
    // files (partition pruning turns nprobe/nCentroids into IO fraction)
    val qv = points(30)._2
    val queryDf = Seq(20000L -> qv).toDF("vec_id", "embedding")
    val cents = spark.read.parquet(s"$idx/centroids").orderBy("cell").collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[scala.collection.Seq[Double]]("centroid").toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val qd = qv.map(_.toDouble)
    val probed = cents.map { case (c, cv) => (cos(qd, cv), c) }
      .sortBy { case (s, c) => (-s, c) }.take(4).map(_._2)
    val scanned = spark.read.parquet(s"$idx/lists")
      .filter($"cell".isin(probed: _*))
      .select(input_file_name()).distinct().as[String].collect()
      .flatMap(f => "cell=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt))
      .toSet
    assert(scanned == probed.toSet,
      s"ADC scan must touch exactly the probed cell dirs: $scanned vs $probed")

    // compression: the list codes are m bytes a vector; the physical
    // footprint stays far below the 4·dim raw representation it scans
    // in place of (codes column ≪ vec column; both live in the lists)
    val (bytes, n) = VectorFunctions.ivfPqIndexBytes(spark, idx)
    assert(n == points.size)
    assert(bytes > 0)
  }

  test("IVF-PQ serving plan reads ONLY (id, codes) in the ADC phase") {
    // the compression claim is physical: the approximate phase must
    // never touch the raw vector column (parquet is columnar — reading
    // vec would erase the m-bytes-per-vector advantage)
    val rnd = new Random(83)
    val points = (0L until 100L).map(id => id -> Array.fill(32)((rnd.nextDouble() * 2 - 1).toFloat))
    val all = points.toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-plan").toString
    VectorFunctions.buildIvfPqIndex(all, "vec_id", "embedding", idx,
      nCentroids = 4, m = 8, ksub = 16)
    val q = Seq(9999L -> points.head._2).toDF("vec_id", "embedding")
    val plan = VectorFunctions.knnIvfPqIndex(spark, idx, q, "embedding",
      k = 5, nprobe = 2, rerank = 16).queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
    assert(schemas.exists(s => s.contains("codes") && !s.contains("vec:")),
      s"ADC phase must scan codes without vec; read schemas: $schemas")
  }

  test("IVF-PQ incremental append: recall holds without rebuild; appended ids servable") {
    val rnd = new Random(79)
    val dim = 64
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    def near(c: Int, id: Long) =
      id -> centers(c).map(x => (x + rnd.nextDouble() * 0.2 - 0.1).toFloat)
    val initial = (0 until 8).flatMap(c => (0 until 30).map(i => near(c, c * 30 + i)))
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-append").toString
    VectorFunctions.buildIvfPqIndex(initial.toDF("vec_id", "embedding"), "vec_id", "embedding",
      idx, nCentroids = 8, m = 8, ksub = 16)

    val appended = (0 until 8).flatMap(c => (0 until 10).map(i => near(c, 1000 + c * 10 + i)))
    VectorFunctions.appendToIvfPqIndex(appended.toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx)
    val everything = initial ++ appended
    assert(spark.read.parquet(s"$idx/lists").count() == everything.size)

    val all = everything.toDF("vec_id", "embedding")
    val recalls = (0 until 10).map { qi =>
      val qv = everything(rnd.nextInt(everything.size))._2
        .map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
      val queryDf = Seq(9999L -> qv).toDF("vec_id", "embedding")
      val brute = VectorFunctions.knnBrute(all, "vec_id", "embedding",
        queryDf, "embedding", k = 10).select("id").as[Long].collect().toSet
      val served = VectorFunctions.knnIvfPqIndex(spark, idx, queryDf, "embedding",
        k = 10, nprobe = 4, rerank = 50).select("id").as[Long].collect().toSet
      (brute intersect served).size.toDouble / brute.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 after append $mean; per-query: $recalls")
    // an appended id is servable through the codes path, not just resident
    val qNew = Seq(8888L -> everything.find(_._1 == 1000L).get._2)
      .toDF("vec_id", "embedding")
    assert(VectorFunctions.knnIvfPqIndex(spark, idx, qNew, "embedding",
      k = 1, nprobe = 2, rerank = 16).select("id").as[Long].head() == 1000L)
    // the occupancy-skew retrain gate reads this layout unchanged
    val stats = VectorFunctions.ivfIndexStats(spark, idx)
    assert(stats.cells == 8 && stats.totalVectors == everything.size)
    assert(!stats.needsRetrain(), s"balanced index flagged: $stats")
  }

  test("residual PQ beats flat PQ's quantization error on clustered data") {
    // The point of composing: once the coarse quantizer absorbs cluster
    // structure, the SAME code budget quantizes the (small) residuals
    // much more finely. Mean ADC error of the composed index must be
    // below flat PQ's on clustered vectors.
    val rnd = new Random(73)
    val dim = 64
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val points = (0 until 8).flatMap { c =>
      (0 until 30).map { i =>
        (c * 30 + i).toLong -> centers(c).map(x => (x + rnd.nextDouble() * 0.2 - 0.1).toFloat)
      }
    }
    val all = points.toDF("vec_id", "embedding")
    val q = points(17)._2
    val queryDf = Seq(9999L -> q).toDF("vec_id", "embedding")

    val cents = VectorFunctions.trainKmeansCentroids(all, "vec_id", "embedding", k = 8)
    val cm = graft.functions.CentroidMatrix.normalized(cents)
    val flatCb = VectorFunctions.trainPqCodebooks(all, "vec_id", "embedding", m = 8, ksub = 16)
    val resCb = VectorFunctions.trainPqResidualCodebooks(all, "vec_id", "embedding", cm,
      m = 8, ksub = 16)

    import graft.functions.{PqExpressions, VectorExpressions}
    val exact = all.crossJoin(broadcast(queryDf.select(col("embedding").as("q"))))
      .select($"vec_id", VectorExpressions.cosine_sim($"embedding", $"q").as("sim"))
    val table = VectorFunctions.adcTable(q.map(_.toDouble), flatCb)
    val flatErr = all
      .select($"vec_id", PqExpressions.pq_adc(
        PqExpressions.pq_encode($"embedding", flatCb), table).as("approx"))
      .join(exact, "vec_id")
      .select(avg(abs($"approx" - $"sim"))).as[Double].head()
    val resTable = VectorFunctions.adcTable(q.map(_.toDouble), resCb)
    val qn = q.map(_.toDouble)
    val qnorm = math.sqrt(qn.map(x => x * x).sum)
    val cellConsts = (0 until cm.k).map { c =>
      (c, cm.row(c).zip(qn).map { case (a, b) => a * b / qnorm }.sum)
    }.toDF("cell", "cconst")
    val resErr = all
      .select($"vec_id", VectorExpressions.nearest_centroid($"embedding", cm).as("cell"),
        $"embedding")
      .join(broadcast(cellConsts), "cell")
      .select($"vec_id", (PqExpressions.pq_adc(
        PqExpressions.pq_encode_residual($"embedding", $"cell", cm, resCb), resTable)
        + $"cconst").as("approx"))
      .join(exact, "vec_id")
      .select(avg(abs($"approx" - $"sim"))).as[Double].head()
    assert(resErr < flatErr,
      s"residual ADC error $resErr must beat flat ADC error $flatErr on clustered data")
  }

  test("v7 driver-row preflight: IVF-PQ == brute top-5 on sf0.01 embeddings") {
    // The driver row's oracle is the exact brute-force top-5 for
    // vec_id 13 at nCentroids=16, m=16, ksub=256 (8-bit codes, the
    // FAISS default), nprobe=12, rerank=64; this replays that gate so a
    // recall regression is caught before the round's Verify run.
    // (Exact at both verified sfs: sf0.01 from nprobe=6/rerank=64 up,
    // sf0.1 from nprobe=12/rerank=64.)
    val dir = "/root/testdata/sf0.01/embeddings.parquet"
    assume(new java.io.File(dir).exists(), s"$dir not present")
    val e = spark.read.parquet(dir)
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-preflight").toString
    VectorFunctions.buildIvfPqIndex(
      e.filter($"vec_id" =!= 13), "vec_id", "embedding", idx,
      nCentroids = 16, m = 16, ksub = 256)
    val brute = VectorFunctions.knnBrute(
      e.filter($"vec_id" =!= 13), "vec_id", "embedding",
      e.filter($"vec_id" === 13), "embedding", k = 5)
      .select("id").as[Long].collect().toSet
    val served = VectorFunctions.knnIvfPqIndex(spark, idx,
      e.filter($"vec_id" === 13), "embedding", k = 5, nprobe = 12, rerank = 64)
      .select("id").as[Long].collect().toSet
    assert(served == brute, s"IVF-PQ must reach exact recall on the driver query; " +
      s"missing=${brute diff served} extra=${served diff brute}")
  }

  test("nearDupPairsLsh finds the pairs nearDupPairsBrute finds (high threshold)") {
    val rnd = new Random(3)
    val dim = 64
    val bases = randomVectors(20, dim, seed = 5)
    // create 20 near-duplicate partners (ids 1000+i)
    val dups = bases.map { case (id, v) =>
      (id + 1000L) -> v.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
    }
    val df = (bases ++ dups).toDF("vec_id", "embedding")
    val brute = VectorFunctions.nearDupPairsBrute(df, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = VectorFunctions.nearDupPairsLsh(df, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture should contain near-dup pairs")
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.95, s"recall $recall; missed ${brute diff lsh}")
    assert(lsh.subsetOf(brute), s"LSH pairs are exact-rescored; extras: ${lsh diff brute}")
  }

  test("simhash: identical token sets get identical fingerprints; near sets are near") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "today again and again dog lazy the over jumps fox brown quick the"), // same set
      (3L, "the quick brown fox jumps over the lazy dog again and again tomorrow"), // 1 word off
      (4L, "completely different words about spark catalyst expressions and codegen here")
    ).toDF("id", "text")
    val fp = docs.select($"id",
        simhash64(array_distinct(filter(split($"text", " "), t => t =!= ""))).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L), "order-insensitive over the distinct token set")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(4L)),
      s"near doc should be nearer: ${ham(fp(1L), fp(3L))} vs ${ham(fp(1L), fp(4L))}")
  }

  test("minhash signature: equal sets equal sigs; sig similarity tracks jaccard") {
    val docs = Seq(
      (1L, (1 to 50).map(i => s"tok$i").mkString(" ")),
      (2L, (1 to 50).map(i => s"tok$i").mkString(" ")),
      (3L, (26 to 75).map(i => s"tok$i").mkString(" ")), // jaccard 1/3
      (4L, (1000 to 1050).map(i => s"tok$i").mkString(" "))) // jaccard 0
      .toDF("id", "text")
    val sig = docs.select($"id",
        minhash_signature(array_distinct(filter(split($"text", " "), t => t =!= "")), 128).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sig(1L) == sig(2L))
    def est(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    assert(math.abs(est(sig(1L), sig(3L)) - 1.0 / 3.0) < 0.15)
    assert(est(sig(1L), sig(4L)) < 0.1)
  }

  test("band_hashes rejects a signature the band layout does not cover") {
    val df = Seq((1L, "a b c d e f g h")).toDF("id", "text")
      .select(minhash_signature(array_distinct(filter(split($"text", " "), t => t =!= "")), 10).as("s"))
    val e = intercept[Exception](df.select(band_hashes($"s", 3, 3)).collect())
    assert(e.getMessage != null)
  }

  test("balancedSample: per-cluster quota, hash-min membership, deterministic") {
    import graft.vectors.VectorFunctions
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = VectorFunctions.trainKmeansCentroids(e, "vec_id", "embedding", k = 8)
    val m = graft.functions.CentroidMatrix.normalized(cents)
    val quota = 5
    val got = VectorFunctions.balancedSample(e, "vec_id", "embedding", m, quota)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // independent replay: assignment + knuth hash + per-cluster smallest
    val assigned = e.select($"vec_id".as("id"),
        graft.functions.VectorExpressions.nearest_centroid($"embedding", m)
          .cast("long").as("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = assigned
      .map { case (id, cl) => (id, cl, id * 2654435761L % 1000000007L) }
      .groupBy(_._2).values
      .flatMap(g => g.sortBy(t => (t._3, t._1)).take(quota))
      .toSet
    assert(got.toSet == expect, s"got=${got.toSet} expect=$expect")
    // quota respected; small clusters keep all members
    got.groupBy(_._2).foreach { case (cl, rows) =>
      val members = assigned.count(_._2 == cl)
      assert(rows.length == math.min(quota, members), s"cluster $cl: ${rows.length}")
    }
    // deterministic replay
    val again = VectorFunctions.balancedSample(e, "vec_id", "embedding", m, quota)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == got.toSet)
  }

  test("semanticDedup with TRAINED centroids satisfies the drop predicate exactly") {
    import graft.vectors.VectorFunctions
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = VectorFunctions.trainKmeansCentroids(e, "vec_id", "embedding", k = 8)
    val m = graft.functions.CentroidMatrix.normalized(cents)
    val threshold = 0.3
    val survivors = VectorFunctions
      .semanticDedup(e, "vec_id", "embedding", m, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // independently recompute assignment and the smaller-id-neighbor
    // predicate, then check survivors are EXACTLY its complement
    val assigned = e.select($"vec_id".as("id"), $"embedding".as("v"),
        graft.functions.VectorExpressions.nearest_centroid($"embedding", m)
          .cast("long").as("cluster"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / math.sqrt(na * nb)
    }
    val total = assigned.length
    assert(total > 0)
    var expectedSurvivors = 0
    for ((id, v, cl) <- assigned) {
      val hasSmallerNeighbor = assigned.exists { case (id2, v2, cl2) =>
        cl2 == cl && id2 < id && cos(v2, v) >= threshold
      }
      if (!hasSmallerNeighbor) expectedSurvivors += 1
      assert(survivors.contains(id) == !hasSmallerNeighbor, s"id=$id")
      if (survivors.contains(id)) assert(survivors(id) == cl, s"cluster of $id")
    }
    // the threshold must actually bite on this corpus
    assert(expectedSurvivors > 0 && expectedSurvivors < total)
  }

  test("rangeSearch returns exactly the >=tau neighbors of each query") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // deterministic synthetic corpus on a 2D circle: cosine(i,j) depends
    // only on the angle gap, so the expected set is analytic
    def vec(deg: Int): Array[Float] =
      Array(math.cos(math.toRadians(deg)).toFloat, math.sin(math.toRadians(deg)).toFloat)
    val corpus = (0 until 36).map(i => (i.toLong, vec(i * 10))).toDF("id", "v")
    val queries = Seq((0L, vec(0)), (9L, vec(90))).toDF("qid", "qv")
    val tau = math.cos(math.toRadians(35)) // within 3 steps (30 deg), not 4 (40)
    val got = graft.vectors.VectorFunctions
      .rangeSearch(corpus, "id", "v", queries, "qid", "qv", tau)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    def ring(c: Int) = (-3 to 3).map(d => ((c + d + 36) % 36).toLong).toSet
    assert(got == ring(0).map((0L, _)) ++ ring(9).map((9L, _)))
  }
}
