package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

/** Targeted regressions for the dedup operators (the driver rows cover
  * the happy paths at corpus scale).
  */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("exact dedup keeps one representative for null-text docs") {
    // xxhash64(null) is null; the collision-verify equi-join can never
    // match null keys, so nulls are routed around the hash machinery —
    // without that, BOTH null docs vanished (r3 ADVICE regression).
    val docs = Seq(
      (1L, "same"), (2L, "same"), (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String]), (5L, "unique")).toDF("id", "text")
    val got = Dedup.exact(docs, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 5L))
  }

  test("exact dedup without any null text is unchanged") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "text")
    assert(Dedup.exact(docs, "id", "text").select("id").as[Long].collect().toSet ==
      Set(1L, 2L))
  }

  test("bloom dedup against a reference corpus is exact (no false negatives or positives)") {
    val ref = (1L to 200L).map(i => (i, s"ref doc $i")).toDF("id", "text")
    val docs = ((1000L to 1099L).map(i => (i, s"new doc $i")) ++ // all survive
      Seq((2000L, "ref doc 7"), (2001L, "ref doc 150"))) // exact dups, dropped
      .toDF("id", "text")
    val got = Dedup.bloomDedup(docs, ref, "text").select("id").as[Long].collect().toSet
    assert(got == (1000L to 1099L).toSet)
  }

  test("bloom dedup with a tiny filter (forced false positives) still confirms exactly") {
    // fpp=0.5 on 500 reference texts makes probe false-positives near
    // certain across 300 probes — the confirm join must rescue them all.
    val ref = (1L to 500L).map(i => (i, s"r$i")).toDF("id", "text")
    val docs = (1L to 300L).map(i => (i, s"n$i")).toDF("id", "text")
    val got = Dedup.bloomDedup(docs, ref, "text", fpp = 0.5)
      .select("id").as[Long].collect().toSet
    assert(got == (1L to 300L).toSet)
  }

  test("partitioned bloom dedup equals the single-filter path exactly") {
    val ref = (1L to 400L).map(i => (i, s"ref doc $i")).toDF("id", "text")
    val docs = ((1000L to 1149L).map(i => (i, s"new doc $i")) ++
      (1L to 50L).map(i => (3000L + i, s"ref doc ${i * 7}")) ++ // dups
      Seq((4000L, null.asInstanceOf[String]), (4001L, null.asInstanceOf[String])))
      .toDF("id", "text")
    val single = Dedup.bloomDedup(docs, ref, "text")
      .select("id").as[Long].collect().toSet
    val parted = Dedup.bloomDedupPartitioned(docs, ref, "text", buckets = 8)
      .select("id").as[Long].collect().toSet
    assert(parted == single)
    // null texts pass through; in-range dups dropped
    assert(parted.contains(4000L) && parted.contains(4001L))
    assert((1L to 50L).forall(i => !parted.contains(3000L + i)))
    // forced false positives (tiny per-bucket filters) confirm exactly
    val fp = Dedup.bloomDedupPartitioned(
        (1L to 300L).map(i => (i, s"n$i")).toDF("id", "text"),
        (1L to 500L).map(i => (i, s"r$i")).toDF("id", "text"),
        "text", buckets = 4, fpp = 0.5)
      .select("id").as[Long].collect().toSet
    assert(fp == (1L to 300L).toSet)
  }

  test("connected components label every node with its cluster's smallest id") {
    // chain 1-2-3, pair 5-4 (reversed), self-contained 9
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 4L), (9L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.components(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 9L -> 9L))
  }

  test("connected components converge in O(log diameter) rounds on a long chain") {
    // A 220-node path: plain min-label propagation would need ~219
    // rounds; pointer jumping must land it well inside 16. driverLimit=0
    // forces the distributed fixpoint (the default would take the
    // union-find fast path on a graph this small).
    val pairs = (0L until 219L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val got = Dedup.components(pairs, "id_a", "id_b", maxRounds = 16, driverLimit = 0)
      .as[(Long, Long)].collect()
    assert(got.length == 220 && got.forall(_._2 == 0L))
  }

  test("driver union-find and distributed fixpoint label identically") {
    // deterministic pseudo-random graph: 400 nodes, 300 edges
    val pairs = (1 to 300).map { i =>
      val a = (i * 2654435761L) % 400
      val b = (i * 1013904223L + 7) % 400
      (a, b)
    }.toDF("id_a", "id_b")
    val fast = Dedup.components(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.components(pairs, "id_a", "id_b", driverLimit = 0)
      .as[(Long, Long)].collect().toMap
    assert(fast == dist)
  }

  test("cluster dedup keeps one representative per near-dup cluster and all singletons") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta epsilon"), // chains to 1/2 transitively
      (7L, "totally different words here entirely")).toDF("id", "text")
    val survivors = Dedup.neardupDedup(docs, "id", "text", n = 2, threshold = 0.5)
      .select("id").as[Long].collect().toSet
    assert(survivors == Set(1L, 7L))
  }

  // clique-shaped corpus: `fams` families of `k` near-identical members
  // (shared base, one distinguishing suffix word each) plus singletons.
  private def cliqueCorpus(fams: Int, k: Int) = {
    val families = for (f <- 1 to fams; m <- 1 to k)
      yield ((f * 100 + m).toLong,
        s"family$f alpha beta gamma delta epsilon zeta eta theta member$m")
    val singles = (1 to 5).map(i =>
      (9000L + i, s"singleton$i completely unrelated words nothing shared$i here$i"))
    (families ++ singles).toDF("id", "text")
  }

  private def clusterMap(edges: org.apache.spark.sql.DataFrame) =
    Dedup.components(edges, "id_a", "id_b").as[(Long, Long)].collect().toMap

  test("star-forced LSH edges cluster identically to all-pairs on clique families") {
    val docs = cliqueCorpus(fams = 3, k = 8)
    val allPairs = clusterMap(
      Dedup.minhashLshPairs(docs, "id", "text", n = 2, threshold = 0.5))
    // starCandidateLimit = 0 forces the linear star path on any volume
    val star = clusterMap(
      Dedup.minhashLshEdges(docs, "id", "text", n = 2, threshold = 0.5,
        starCandidateLimit = 0L))
    assert(star == allPairs && allPairs.nonEmpty)
  }

  test("edges mode star-links oversize buckets that pair mode drops") {
    // maxBucket=1: EVERY shared bucket is oversize, so pair mode loses
    // the 12-member family entirely — edges mode star-links the
    // oversize buckets at O(k) and the family still clusters
    val docs = cliqueCorpus(fams = 1, k = 12)
    val pairs = Dedup.minhashLshPairs(docs, "id", "text",
      n = 2, threshold = 0.5, maxBucket = 1)
    assert(pairs.count() == 0)
    val edges = Dedup.minhashLshEdges(docs, "id", "text",
      n = 2, threshold = 0.5, maxBucket = 1)
    val comp = clusterMap(edges)
    assert((101L to 112L).forall(id => comp(id) == 101L))
  }

  test("star expansion of exact-clone groups preserves components") {
    // exact clones trigger the pre-LSH collapse; starLimit=0 forces the
    // star-shaped member expansion, which must cluster like the full one
    val clones = for (f <- 1 to 3; c <- 1 to 6)
      yield ((f * 1000 + c).toLong, s"clone family $f same text for every copy")
    val docs = (clones ++ Seq((5000L, "one lonely unrelated document"))).toDF("id", "text")
    val full = clusterMap(
      Dedup.minhashLshPairs(docs, "id", "text", n = 2, threshold = 0.5))
    val star = clusterMap(
      Dedup.minhashLshEdges(docs, "id", "text", n = 2, threshold = 0.5,
        starCandidateLimit = 0L))
    assert(star == full && full.keySet == clones.map(_._1).toSet)
  }

  test("crossContamination flags near-dup eval leakage that exact n-grams miss") {
    val benchText = (1 to 40).map(i => s"tok$i").mkString(" ")
    // light paraphrase: 2 of 40 tokens changed — bigram Jaccard ~0.88,
    // but NO shared 40-gram (exact whole-doc matching misses it)
    val paraphrase = ((1 to 40).map(i => if (i == 7 || i == 23) s"edit$i" else s"tok$i")).mkString(" ")
    val clean = (100 to 140).map(i => s"other$i").mkString(" ")
    val bench = Seq((1000L, benchText)).toDF("doc_id", "text")
    val train = Seq((1L, paraphrase), (2L, clean), (3L, benchText)).toDF("doc_id", "text")
    val flagged = graft.dedup.Dedup.crossContamination(train, bench, "doc_id", "text",
        n = 2, threshold = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(flagged.keySet == Set(1L, 3L),
      s"paraphrase and exact copy must flag, clean must not: $flagged")
    assert(flagged(3L) == 1L)
  }

  test("paragraphDedup: first occurrence survives, order preserved, empty docs survive") {
    // unit = 2 words; doc 1 owns "a b" and "c d"; doc 2 repeats "a b"
    // (dropped) and contributes "e f"; doc 3 is ENTIRELY boilerplate
    // and must reassemble to the empty string, not vanish
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "a b c d")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text", unitWords = 2)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, "a b c d", 2L, 2L)))
    assert(out(1) == ((2L, "e f", 2L, 1L)), "repeated unit drops, own unit stays in order")
    assert(out(2) == ((3L, "", 2L, 0L)), "fully-deduped doc reassembles empty, not missing")

    // a tail shorter than the unit width is its own unit
    val tail = Dedup.paragraphDedup(Seq((7L, "x y z")).toDF("doc_id", "text"),
      "doc_id", "text", unitWords = 2).collect().head
    assert(tail.getString(1) == "x y z" && tail.getLong(2) == 2)
  }

  test("substring scrub excises recurring spans, keeps global firsts, unions overlaps") {
    val docs = Seq(
      (1L, "a b c d e f"),      // owns the first "a b c d": intact
      (2L, "x a b c d y"),      // one dup span at pos 1: words 1..4 go
      (3L, "a b c d e f"),      // exact clone: every gram is non-first
      (4L, "p q")               // shorter than k: never matches
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k = 4)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, "a b c d e f", 6L, 0L)))
    assert(out(1) == ((2L, "x y", 6L, 4L)),
      "the duplicated window's four words must be excised")
    assert(out(2) == ((3L, "", 6L, 6L)),
      "an exact clone's overlapping dup windows must union to the whole doc")
    assert(out(3) == ((4L, "p q", 2L, 0L)))
  }

  test("simhash cap drops degenerate segment buckets instead of going quadratic") {
    // identical texts -> identical fingerprints -> every segment bucket
    // holds all docs; a cap below the doc count suppresses ALL candidate
    // pairs (they would need an under-cap shared segment)
    val docs = (1L to 20L).map(i => (i, "the same text repeated over and over"))
      .toDF("id", "text")
    val uncapped = Dedup.simhashPairs(docs, "id", "text", maxHamming = 3)
    assert(uncapped.count() == 20L * 19 / 2) // all pairs, hamming 0
    val capped = Dedup.simhashPairs(docs, "id", "text", maxHamming = 3, maxBucket = 10)
    assert(capped.count() == 0)
  }
}
