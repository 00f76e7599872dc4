package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

/** Corpus deduplication operators for training-data pipelines: exact,
  * exact n-gram Jaccard, MinHash+LSH, and SimHash. All are shuffle-lean
  * by construction:
  *  - exact dedup is two-phase: the wide grouping shuffles (hash, id)
  *    longs; document text joins in only for hash-collision groups and
  *    the surviving rows;
  *  - exact Jaccard counts intersections through the inverted index in
  *    codegen'd long arithmetic (optional posting-list cap for stopword
  *    n-grams); it is the exact/small path — MinHash+LSH is the scale
  *    path;
  *  - MinHash/LSH shuffles only (band hash, doc id) pairs, with a bucket
  *    size cap against degenerate buckets — candidate generation never
  *    moves document bodies;
  *  - candidate verification joins the shingle sets back in only for the
  *    (tiny) candidate set.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per distinct text. Two-phase so
    * the wide shuffle carries longs, not text: (1) group by
    * xxhash64(text) over (hash, id) alone; (2) only hash groups with >1
    * doc re-join their text to verify equality (collision-safe);
    * (3) winners join back for the output text (AQE broadcasts the
    * winner set when small).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // xxhash64(null) is null and the collision-verify equi-join on __h can
    // never match null keys, so null-text docs are routed around the hash
    // machinery: they form one group whose min-id representative survives.
    // (groupBy over an empty input yields zero groups, so this is a no-op
    // when every doc has text.)
    val nullWinner = docs.filter(col(textCol).isNull)
      .groupBy(col(textCol)).agg(min(col(idCol)).as(idCol)).select(col(idCol))
    val hashed = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol), xxhash64(col(textCol)).as("__h"))
    val groups = hashed.select(col("__h"), col(idCol))
      .groupBy("__h")
      .agg(min(col(idCol)).as("__minid"), count(lit(1)).as("__n"))
    // unique hash -> its single doc wins, no text ever shuffled
    val singles = groups.filter(col("__n") === 1).select(col("__minid").as(idCol))
    // collided hashes (rare): verify true text equality within the group
    val collided = hashed.join(
        groups.filter(col("__n") > 1).select("__h"), "__h")
      .groupBy(col("__h"), col(textCol))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    docs.select(col(idCol), col(textCol))
      .join(singles.unionByName(collided).unionByName(nullWinner), Seq(idCol), "left_semi")
  }

  /** All pairs (a < b) with exact word-n-gram Jaccard >= threshold, via
    * an inverted shingle index: join on shingle, count intersections,
    * derive the union from set sizes — intersection counting stays in
    * codegen'd long arithmetic, no per-pair array materialization.
    *
    * EXACT but inherently Ω(Σ df²) in posting sizes, so this is the
    * small/medium-corpus path; [[minhashLshPairs]] is the 100-TB path.
    * `maxPostings` optionally drops shingles whose posting list exceeds
    * the cap (stopword n-grams) — the standard safety valve; it
    * undercounts intersections for pairs relying on capped shingles, so
    * the default leaves it off (exact).
    *
    * (A positional-prefix-filter variant — Bayardo WWW'07 — was
    * measured here and LOST 5x on the driver corpus: its vocabulary is
    * ~1k shingles, so every posting list is hot, 8M candidate pairs
    * survive the prefix, and per-candidate array intersection dwarfs the
    * count-based join. Prefix filtering only pays on Zipfian vocabularies
    * with a long rare tail.)
    */
  /** Vocabulary bound under which [[ngramJaccardPairs]] switches to the
    * dictionary-encoded bitset strategy (mask of `vocab` bits per doc,
    * broadcast, AND+popcount per pair in codegen — no wide shuffle).
    */
  val BitsetVocabLimit = 16384
  private val BitsetDocLimit = 100000L
  /** Cap on the broadcast mask matrix (docs × vocab/8 bytes): the doc
    * and vocab limits alone would allow 100k × 2KB = 200MB broadcasts.
    */
  private val BitsetBroadcastBytesLimit = 64L * 1024 * 1024

  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxPostings: Long = Long.MaxValue): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), explode(shingleSet(col(textCol), n)).as("shingle"))

    // Adaptive physical strategy (driver-side, like AQE): a dense corpus
    // — small shingle vocabulary — makes every posting list hot, so the
    // inverted index degenerates to Σ df² join rows; a bitset mask per
    // doc beats it by orders of magnitude there. Large vocabularies take
    // the classic inverted-index path below.
    denseDict(sh, docCount = sh.select("id").distinct().count()) match {
      case Some(dict) => return bitsetJaccardPairs(sh, threshold, dict)
      case None =>
    }

    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val index =
      if (maxPostings == Long.MaxValue) sh
      else {
        val keep = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxPostings).select("shingle")
        sh.join(keep, Seq("shingle"))
      }
    val inter = index.as("a").join(index.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash + LSH near-dup pairs: signature -> band buckets -> candidate
    * pairs -> exact-Jaccard verification. With numHashes=128 and
    * bands=64 (r=2), recall at jaccard>=0.5 is 1 - (1-0.25)^64 ~ 1-1e-8.
    * Only (band hash, id) pairs shuffle; verification joins shingle sets
    * for candidates only.
    *
    * `maxBucket` guards the self-join against degenerate buckets (a
    * bucket of k docs emits k² candidate rows): buckets above the cap are
    * dropped before the join. A pair is lost only if EVERY one of its 64
    * shared buckets is oversize — near-duplicate clusters of that size
    * should be handled by exact dedup first.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, numHashes: Int = 128, bands: Int = 64,
      maxBucket: Int = 10000): DataFrame = {
    val cleanup = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val pairs = lshPairs(docs, idCol, textCol, n, threshold, numHashes, bands,
      maxBucket, starLimit = Long.MaxValue, cleanup = cleanup)
    unpersistAfterAction(pairs, cleanup.toSeq)
  }

  /** Candidate-volume bound above which [[minhashLshEdges]] switches from
    * all-pairs bucket enumeration to per-bucket star edges. 50M candidate
    * rows is a ~1 GB distinct shuffle — comfortably cheap; the corpora
    * that exceed it are the quadratic-blowup ones where all-pairs is tens
    * of billions of rows.
    */
  val StarCandidateLimit: Long = 50L * 1000 * 1000

  /** Connectivity-oriented LSH edges for CLUSTER dedup, adaptive in the
    * candidate-volume dimension: identical to [[minhashLshPairs]] while
    * Σ k·(k−1)/2 over kept buckets stays ≤ `starCandidateLimit`, and
    * per-bucket STAR candidates above it — each bucket member links to
    * the bucket's minimum id, O(k) rows per bucket instead of O(k²), the
    * linear candidate generation published web-scale MinHash dedup
    * pipelines use. A corpus whose near-dup families have thousands of
    * members (boilerplate, templated pages) makes all-pairs enumeration
    * Ω(family²) — ~10¹² rows for a 1M-member family at 100 TB — while its
    * cluster closure is linear-sized; the star graph spans exactly that
    * closure. Every star edge is verified by exact Jaccard like any other
    * candidate, and the star edge set is a SUBSET of the all-pairs edge
    * set (the hub shares the bucket with each member), so star-mode
    * clusters are always a refinement of all-pairs clusters: never an
    * over-merge, at worst a chain-shaped cluster splits where only an
    * unverifiable hub link would have bridged it. Below the limit, the
    * one departure from [[minhashLshPairs]] is that buckets OVER
    * `maxBucket` are star-linked instead of dropped — linear cost, and
    * they are exactly the giant boilerplate families cluster dedup
    * exists to remove. Use this for cluster closure ([[neardupDedup]]);
    * use [[minhashLshPairs]] when the product is the pair listing
    * itself, which is inherently quadratic.
    */
  def minhashLshEdges(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, numHashes: Int = 128, bands: Int = 64,
      maxBucket: Int = 10000,
      starCandidateLimit: Long = StarCandidateLimit): DataFrame = {
    val cleanup = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val pairs = lshPairs(docs, idCol, textCol, n, threshold, numHashes, bands,
      maxBucket, starLimit = starCandidateLimit, cleanup = cleanup)
    unpersistAfterAction(pairs, cleanup.toSeq)
  }

  /** Unpersist `caches` once the next terminal action on `df`'s session
    * completes (success or failure). The public lazy entry points persist
    * internal relations so ONE terminal action pays each shared subplan
    * once; after that action the caches are dead CacheManager entries —
    * the orphaned-block scale tax minhashLshEdgesCached exists to avoid,
    * now closed for callers that can't receive cleanup handles. A second
    * action on the same result recomputes without the caches (identical
    * rows, just no sharing); unpersisting mid-plan is safe because cache
    * substitution happens per-execution.
    */
  private def unpersistAfterAction(df: DataFrame, caches: Seq[DataFrame]): DataFrame = {
    if (caches.isEmpty) return df
    val mgr = df.sparkSession.listenerManager
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private def done(): Unit = {
        caches.foreach(c => try c.unpersist()
          catch { case scala.util.control.NonFatal(_) => () })
        mgr.unregister(this)
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = done()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = done()
    }
    mgr.register(listener)
    df
  }

  /** [[minhashLshEdges]] plus the relations it persisted, for callers
    * that consume the edges EAGERLY (components): once the edge set is
    * materialized the caches are dead weight, and a session that runs
    * many dedup pipelines otherwise accumulates orphaned cached blocks
    * until storage-memory eviction churn taxes every later query (the
    * clearCache lesson documented in BenchScale).
    */
  private[graft] def minhashLshEdgesCached(docs: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double,
      starCandidateLimit: Long = StarCandidateLimit): (DataFrame, Seq[DataFrame]) = {
    val cleanup = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val pairs = lshPairs(docs, idCol, textCol, n, threshold, numHashes = 128,
      bands = 64, maxBucket = 10000, starLimit = starCandidateLimit,
      cleanup = cleanup)
    (pairs, cleanup.toSeq)
  }

  private def lshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, numHashes: Int, bands: Int,
      maxBucket: Int, starLimit: Long,
      cleanup: scala.collection.mutable.Buffer[DataFrame] = null): DataFrame = {
    def tracked(df: DataFrame): DataFrame = {
      if (cleanup != null) cleanup += df
      df
    }
    val rows = numHashes / bands
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    // Duplication gate FIRST, over raw text hashes — no shingle work:
    // exact text clones (the dominant clone mode in crawled corpora)
    // imply identical shingle sets. A low estimate skips the collapse
    // machinery entirely, leaving the classic pipeline untouched.
    val dupStats = docs.filter(col(textCol).isNotNull)
      .agg(count(lit(1)).cast("double").as("n"),
        approx_count_distinct(xxhash64(col(textCol))).cast("double").as("u")).head()
    val collapse = dupStats.getDouble(0) >= dupStats.getDouble(1) * 1.5

    val rawSets = docs.select(col(idCol).as("id"), shingleSet(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    // ALWAYS persist the shingle sets: even without collapse the subplan
    // is consumed three more times after the bucket build — both sides
    // of the verification join and the density stats — and shingle
    // derivation is the map-heavy step of the whole pipeline; spilling
    // one materialization beats recomputing it per consumer (guide §2.4:
    // shared subplans should pay their pass once).
    val allSets = tracked(rawSets.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // EXACT-DUPLICATE COLLAPSE (result-identical): docs with the same
    // shingle set are jaccard-1 with each other and share every minhash,
    // so only one representative per set enters LSH. Crawled corpora are
    // heavy with exact duplicates, and each k-clone cluster otherwise
    // multiplies every bucket's self-join k² — a large candidate-volume
    // lever that loses NOTHING: within-group pairs are emitted directly
    // as jaccard 1.0, and a member inherits its representative's
    // verified pairs verbatim (identical sets ⇒ identical jaccard to any
    // third doc). ADAPTIVE like the dense-corpus strategies: the
    // group/expand machinery costs a set-keyed shuffle plus three joins,
    // so it only runs when the text-hash duplication gate above says
    // clones are actually there to collapse.
    val groups =
      if (!collapse) null
      else tracked(allSets.groupBy(col("sh")).agg(collect_list(col("id")).as("ids"))
        .select(array_min(col("ids")).as("rep"), col("ids"), col("sh"))
        .persist())
    val withSets =
      if (collapse) groups.select(col("rep").as("id"), col("sh")) else allSets

    val sigs = withSets.select(col("id"),
      bandHashes(minhashSignature(col("sh"), numHashes), bands, rows).as("bh"))
    val buckets = sigs.select(col("id"), posexplode(col("bh")).as(Seq("band", "h")))
    val edgesMode = starLimit < Long.MaxValue

    // Per-bucket star edges: every member links to the bucket's minimum
    // id. One window shuffle, O(k) output per bucket, preserves the
    // id_a < id_b invariant (the hub IS the minimum).
    def starEdges(bk: DataFrame): DataFrame = {
      val wBucket = org.apache.spark.sql.expressions.Window.partitionBy("band", "h")
      bk.withColumn("__hub", min(col("id")).over(wBucket))
        .filter(col("id") =!= col("__hub"))
        .select(col("__hub").as("id_a"), col("id").as("id_b"))
    }

    val candidates =
      if (!edgesMode) {
        // PAIR-LISTING MODE (minhashLshPairs): oversize buckets dropped,
        // all-pairs enumeration over the rest. The bucket relation is
        // persisted like edges mode's — its cap aggregation and both
        // self-join sides would otherwise re-evaluate the minhash
        // signatures (the expensive map) once each.
        val bk = tracked(buckets.persist())
        val smallBuckets = bk.groupBy("band", "h")
          .agg(count(lit(1)).as("__bc"))
          .filter(col("__bc") <= maxBucket)
          .select("band", "h")
        val capped = bk.join(smallBuckets, Seq("band", "h"))
        capped.as("a").join(capped.as("b"),
            col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
              col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .distinct()
      } else {
        // EDGES MODE: the strategy gate needs the EXACT candidate volume
        // (the isDense precedent — approx wobble at the limit flips
        // plans), which costs one extra action. Persist the bucket
        // relation itself — (id, band, h), ~20 B × docs × bands — so the
        // gate, the cap filter, and both candidate-join sides read the
        // persisted rows instead of re-evaluating the shingle+minhash
        // lineage (the expensive subplan) once per consumer.
        val bk = tracked(buckets.persist())
        val bucketCounts = bk.groupBy("band", "h").agg(count(lit(1)).as("__bc"))
        val volume = Option(
            bucketCounts.filter(col("__bc") <= maxBucket)
              .agg(sum(col("__bc") * (col("__bc") - lit(1L))).as("v"))
              .head().get(0))
          .map(_.asInstanceOf[Long] / 2).getOrElse(0L)
        val star = volume > starLimit
        if (star) {
          // Quadratic blowup detected: star-link EVERY bucket — linear,
          // so the oversize cap is unnecessary (and dropping giant
          // buckets would drop exactly the boilerplate families cluster
          // dedup most wants linked).
          starEdges(bk).distinct()
        } else {
          // Volume is cheap: all-pairs over in-cap buckets — identical
          // to pair-listing mode — PLUS star edges for oversize buckets
          // (which pair mode drops; O(k) makes them affordable here).
          val small = bk.join(
            bucketCounts.filter(col("__bc") <= maxBucket).select("band", "h"),
            Seq("band", "h"))
          val over = bk.join(
            bucketCounts.filter(col("__bc") > maxBucket).select("band", "h"),
            Seq("band", "h"))
          val allPairs = small.as("a").join(small.as("b"),
              col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
                col("a.id") < col("b.id"))
            .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          allPairs.unionByName(starEdges(over)).distinct()
        }
      }
    val repPairs = verifyJaccard(candidates, withSets, threshold)
    if (!collapse) return repPairs

    val members = groups.select(col("rep"), explode(col("ids")).as("member"))
    // Exact-clone groups are unbounded by maxBucket, so member expansion
    // has its own quadratic dimension: Σ g·(g−1)/2 within-group pairs (a
    // 1M-clone family = 5·10¹¹ rows). In edges mode, gate it by the same
    // volume bound; the star expansion (rep→member 1.0-edges + rep-level
    // verified pairs verbatim — reps ARE member ids, array_min(ids)) has
    // identical connected components.
    val withinVolume =
      if (!edgesMode) 0L
      else Option(groups
          .agg(sum(size(col("ids")).cast("long") * (size(col("ids")) - lit(1))).as("v"))
          .head().get(0))
        .map(_.asInstanceOf[Long] / 2).getOrElse(0L)
    if (edgesMode && withinVolume > starLimit) {
      val within = members.filter(col("member") =!= col("rep"))
        .select(col("rep").as("id_a"), col("member").as("id_b"),
          lit(1.0).as("jaccard"))
      repPairs.unionByName(within)
    } else {
      // expand representatives back to members
      val cross = repPairs
        .join(members.select(col("rep").as("id_a"), col("member").as("m_a")), "id_a")
        .join(members.select(col("rep").as("id_b"), col("member").as("m_b")), "id_b")
        .select(least(col("m_a"), col("m_b")).as("id_a"),
          greatest(col("m_a"), col("m_b")).as("id_b"), col("jaccard"))
      val within = members.as("x").join(members.as("y"),
          col("x.rep") === col("y.rep") && col("x.member") < col("y.member"))
        .select(col("x.member").as("id_a"), col("y.member").as("id_b"),
          lit(1.0).as("jaccard"))
      cross.unionByName(within)
    }
  }

  /** Exact-Jaccard verification of candidate pairs, adaptive like
    * [[ngramJaccardPairs]]: dense vocabularies verify via dictionary
    * bitset masks (AND+popcount per pair — a dense corpus also produces
    * the most candidates, where per-pair `array_intersect` hashing is
    * ruinous); sparse ones join the shingle arrays directly.
    */
  private def verifyJaccard(candidates: DataFrame, withSets: DataFrame,
      threshold: Double): DataFrame = {
    val sh = withSets.select(col("id"), explode(col("sh")).as("shingle"))
    // withSets is cached by the caller, so the doc count is a cheap
    // cache scan (ids are distinct per row by construction)
    val dictOpt = denseDict(sh, docCount = withSets.count())
    if (dictOpt.isDefined) {
      import graft.functions.BitsetExpressions._
      val masks = bitsetMasks(sh, dictOpt.get)
      candidates
        .join(masks.select(col("id").as("id_a"), col("sz").as("sz_a"), col("mask").as("m_a")), "id_a")
        .join(masks.select(col("id").as("id_b"), col("sz").as("sz_b"), col("mask").as("m_b")), "id_b")
        .withColumn("inter", bitset_intersect_count(col("m_a"), col("m_b")))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    } else {
      candidates
        .join(withSets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(withSets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }
  }

  /** Dense-corpus gate + dictionary in ONE bounded probe. The gate must
    * stay EXACT (the r14 approx-wobble incident: ±2% at the limit
    * flipped a 50k-doc corpus onto the uncapped inverted-index path —
    * a timeout, not a slowdown), but exactness does not require a full
    * distinct COUNT: collecting `distinct().limit(gate+1)` decides the
    * gate with the same precision — > gate rows means not dense, ≤ gate
    * rows IS the complete vocabulary — while the limit stops the reduce
    * after gate+1 rows instead of aggregating the whole corpus's
    * vocabulary (the difference between a bounded probe and a full
    * exact aggregation at 100 TB). When dense, the probe doubles as the
    * bitset dictionary, so the old separate dictionary job disappears.
    * `docCount` is only forced when the vocabulary fits.
    */
  private def denseDict(sh: DataFrame, docCount: => Long): Option[Array[Any]] = {
    val vocabGate = BitsetVocabLimit * 9 / 10
    val probe = sh.select("shingle").distinct()
      .limit(vocabGate + 1).collect().map(_.get(0))
    if (probe.length > vocabGate) return None
    val d = docCount
    val maskBytes = ((probe.length + 63) / 64) * 8
    if (d <= BitsetDocLimit && d * maskBytes <= BitsetBroadcastBytesLimit)
      // deterministic dictionary order (masks reproduce run-to-run);
      // bit positions don't affect results — popcounts are
      // order-invariant
      Some(probe.sortBy(v => String.valueOf(v)))
    else None
  }

  /** Per-doc (id, set size, bitset mask) over dictionary-encoded
    * shingles; shared by the dense-corpus strategies.
    */
  private def bitsetMasks(sh: DataFrame, ord: Array[Any]): DataFrame = {
    import graft.functions.BitsetExpressions._
    val spark = sh.sparkSession
    // the dictionary arrives pre-collected from the dense-gate probe
    // ([[denseDict]]) — no extra job; it broadcasts into the same join
    val shingleField = sh.schema("shingle")
    val dict = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ord.zipWithIndex.map { case (v, i) => org.apache.spark.sql.Row(v, i) }.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(shingleField,
        org.apache.spark.sql.types.StructField("sid",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
    val vocab = ord.length
    val numWords = math.max((vocab + 63) / 64, 1)
    sh.join(broadcast(dict), "shingle")
      .groupBy("id").agg(collect_list(col("sid")).as("sids"))
      .select(col("id"), size(col("sids")).as("sz"),
        bitset_from_indices(col("sids"), numWords).as("mask"))
  }

  /** Dense-corpus exact Jaccard: dictionary-encode shingles to int ids,
    * pack each doc's set into a `vocab`-bit mask, broadcast the masks,
    * and AND+popcount every (a < b) pair — zero wide shuffles, no
    * posting-list blowup. Gated by [[BitsetVocabLimit]]/doc count above.
    *
    * The pair sweep is a hand-rolled mapPartitions kernel over the
    * broadcast mask array rather than a broadcast-nested-loop join: the
    * work is O(docs²) TINY operations (a few dozen AND+popcounts), so
    * the join's per-row machinery dominated the arithmetic by ~10×. The
    * driver-side collect materializes exactly what the BNLJ broadcast
    * collected anyway (≤ docLimit masks); outer rows are round-robin
    * repartitioned because row i's work is proportional to docs − i —
    * contiguous ranges would skew the triangle onto one task.
    */
  private def bitsetJaccardPairs(sh: DataFrame, threshold: Double,
      dict: Array[Any]): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val rows = bitsetMasks(sh, dict).select("id", "sz", "mask").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[scala.collection.Seq[Long]](2).toArray))
      .sortBy(_._1)
    // parallel primitive arrays, not an Array[Tuple3]: the inner loop
    // runs O(docs²) times, and generic-tuple field reads (boxed longs)
    // plus a per-pair Iterator allocation in the previous revision cost
    // ~800ns/pair — 20-40× the actual AND+popcount arithmetic. At 50k
    // docs (1.25e9 pairs) that was the difference between ~3s and a
    // timeout.
    val ids = rows.map(_._1)
    val szs = rows.map(_._2)
    val masks = rows.map(_._3)
    val bc = spark.sparkContext.broadcast((ids, szs, masks))
    val n = rows.length
    val parallelism = spark.sparkContext.defaultParallelism
    spark.range(n.toLong).repartition(parallelism).as[Long]
      .mapPartitions { it =>
        val (ids, szs, masks) = bc.value
        it.flatMap { ii =>
          val i = ii.toInt
          val idA = ids(i)
          val szA = szs(i)
          val mA = masks(i)
          val words = mA.length
          val hits = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
          var j = i + 1
          while (j < n) {
            val mB = masks(j)
            var inter = 0
            var w = 0
            while (w < words) { inter += java.lang.Long.bitCount(mA(w) & mB(w)); w += 1 }
            val jac = inter.toDouble / (szA + szs(j) - inter)
            if (jac >= threshold) hits += ((idA, ids(j), jac))
            j += 1
          }
          hits
        }
      }
      .toDF("id_a", "id_b", "jaccard")
  }

  /** Connected components over a pair list. Two strategies behind one
    * contract (labels = min id per component; only nodes appearing in
    * the pair list are labeled):
    *
    *  - **small graphs** (≤ [[DriverGraphLimit]] pairs, integral ids):
    *    driver union-find — a near-dup pair set is a sliver of the
    *    corpus (it IS the duplication rate), and 1M pairs collect as a
    *    few tens of MB and solve in milliseconds, versus O(log diameter)
    *    Spark rounds of 2 joins + an action each. The same small-side
    *    economics as the driver-side sketch merge (A5).
    *  - **at scale**: min-label propagation with pointer jumping — every
    *    node starts labeled min(own id, neighbor ids); each round takes
    *    the min across edges AND follows label→label(label) (path
    *    halving), so convergence needs O(log diameter) rounds, not
    *    O(diameter). All work is hash joins + partial aggregations on
    *    (id, label) longs — no driver-side graph, so a 100-TB corpus's
    *    worst-case near-dup graph distributes like any other join.
    *    Every round's labels are eagerly local-checkpointed
    *    (lineage-FREE, blocks reclaimed by the ContextCleaner once the
    *    round's frame is unreferenced). Throws if the fixpoint is not
    *    reached within `maxRounds`: silently returning partial labels
    *    would make a dedup caller keep several "representatives" of one
    *    cluster.
    */
  val DriverGraphLimit: Long = 1000000L

  /** Driver union-find for small pair graphs: union-by-min + path
    * compression, so each tree's root IS the smallest id in its
    * component and the output labels match the distributed fixpoint
    * exactly. Only nodes appearing in the pair list are labeled (same
    * contract as the distributed path).
    */
  private def driverComponents(spark: org.apache.spark.sql.SparkSession,
      edges: Array[(Long, Long)], intOut: Boolean): DataFrame = {
    import spark.implicits._
    val parent = new java.util.HashMap[Long, Long](edges.length * 2)
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.putIfAbsent(a, a)
      parent.putIfAbsent(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val labels = new Array[(Long, Long)](parent.size)
    val it = parent.keySet.iterator()
    var i = 0
    while (it.hasNext) { val id = it.next(); labels(i) = (id, find(id)); i += 1 }
    val df = labels.toSeq.toDF("id", "component")
    if (intOut) df.select(col("id").cast("int").as("id"),
      col("component").cast("int").as("component"))
    else df
  }

  def components(pairs: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 50, driverLimit: Long = DriverGraphLimit): DataFrame = {
    // Materialize the pair list ONCE before symmetrizing: a union of two
    // projections of the same subplan executes that subplan twice, and
    // the pair pipeline feeding this (MinHash/LSH candidate generation)
    // is the most expensive plan in the dedup family.
    val p = pairs.select(col(srcCol).as("s"), col(dstCol).as("d")).persist()
    val integralIds = p.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType)
    // ONE bounded action decides the strategy AND fetches the edges:
    // take(limit+1) is driver-safe by construction (≤ limit+1 rows ever
    // reach the driver) and replaces the previous count()+collect()
    // pair — two full passes over the pair pipeline, the most expensive
    // lineage in the dedup family, folded into one that stops early on
    // huge graphs (take materializes partitions incrementally).
    if (integralIds && driverLimit > 0) {
      val intOut = p.schema.fields.forall(_.dataType ==
        org.apache.spark.sql.types.IntegerType)
      val cap = math.min(driverLimit, Int.MaxValue - 2L).toInt
      val head = p.select(col("s").cast("long"), col("d").cast("long"))
        .take(cap + 1)
      // compare against CAP, not driverLimit: with driverLimit >
      // Int.MaxValue-2 the take() is truncated at cap+1 rows, and a
      // driverLimit comparison would accept that silently-incomplete
      // edge set (wrong components); head.length == cap+1 must always
      // mean "too big, go distributed"
      if (head.length <= cap) {
        // path marker for bench logs: which components engine ran is a
        // scale question (driver union-find vs distributed jumping)
        System.err.println(s"[graft] components: DRIVER union-find " +
          s"(${head.length} edges <= limit $driverLimit)")
        val out = driverComponents(p.sparkSession,
          head.map(r => (r.getLong(0), r.getLong(1))), intOut)
        p.unpersist()
        return out
      }
    }
    System.err.println(s"[graft] components: DISTRIBUTED pointer-jumping " +
      s"(edges > limit $driverLimit or non-integral ids)")
    // Eager localCheckpoint, NOT persist: labels feed the next round in
    // several places (neighbor join + pointer jump), so a cached-but-
    // lineage-carrying frame doubles the LOGICAL plan every round —
    // exponential analysis cost that OOMs the driver near 17 rounds even
    // though the cached data is tiny. Checkpointing truncates the plan,
    // keeping every round's analysis O(1); blocks are reclaimed by the
    // ContextCleaner once a round's frame is unreferenced.
    val edges = p.select(col("s").as("a"), col("d").as("b"))
      .unionByName(p.select(col("d").as("a"), col("s").as("b")))
      .distinct()
      .localCheckpoint(true)
    p.unpersist()
    // init = round 1 for free: min(own id, min neighbor id) costs the
    // same single shuffle as a distinct over node ids would
    var labels = edges.groupBy("a")
      .agg(least(col("a"), min(col("b"))).as("component"))
      .select(col("a").as("id"), col("component"))
      .localCheckpoint(true)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val neighborMin = edges
        .join(labels.select(col("id").as("b"), col("component").as("nc")), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("nc")).as("nmin"))
      // carry the previous label through the join so convergence is a
      // filter+count over the (checkpointed) round result — one action
      // per round instead of an extra labels self-join
      val propagated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("component").as("prev"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("mid"))
      // pointer jump (path halving): label ← label(label). Every label
      // value IS a node id in the same component (it is a min over
      // member ids), so the self-join on the label table always has a
      // row to follow; labels stay non-increasing and within the
      // component, so the plain-propagation fixpoint (= true component
      // minima) is unchanged — the jump only shortcuts the rounds.
      val next = propagated
        .join(labels.select(col("id").as("mid"), col("component").as("jump")),
          Seq("mid"), "left")
        .select(col("id"), col("prev"),
          least(col("mid"), coalesce(col("jump"), col("mid"))).as("component"))
        .localCheckpoint(true)
      val changed = next.filter(col("component") < col("prev")).count()
      labels = next
      converged = changed == 0
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds — " +
          "a cluster's diameter exceeds the bound; raise maxRounds")
    labels.select("id", "component")
  }

  /** Cluster-level near-duplicate dedup: MinHash+LSH edges
    * ([[minhashLshEdges]] — linear star candidates when bucket volume
    * goes quadratic) → connected components → keep ONE representative
    * (the smallest id) per cluster. This is what a training-data
    * pipeline actually does with near-dup pairs — pairs alone
    * over-remove (a—b, b—c would drop both b and c even though a and c
    * may not match) — so the cluster closure is the unit of
    * deduplication.
    */
  def neardupDedup(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      driverLimit: Long = DriverGraphLimit): DataFrame = {
    val (pairs, cached) = minhashLshEdgesCached(docs, idCol, textCol, n, threshold)
    // components() consumes the edge set eagerly (take / checkpointed
    // fixpoint), after which the pipeline's caches are dead weight
    val comp = components(pairs, "id_a", "id_b", driverLimit = driverLimit)
    cached.foreach(_.unpersist())
    val losers = comp.filter(col("component") =!= col("id")).select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Cluster dedup keeping the BEST representative — what production
    * pipelines actually retain (FineWeb keeps the longest / highest-
    * quality member, not the smallest id): same candidate pipeline and
    * connected components as [[neardupDedup]], but the survivor per
    * cluster is argmax(quality) with a min-id tiebreak, computed as a
    * single `max(struct(quality, -id))` hash aggregation — no window,
    * no per-cluster sort. Docs outside every near-dup cluster keep
    * themselves (coalesce to own id).
    */
  def neardupDedupBest(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, quality: Column,
      driverLimit: Long = DriverGraphLimit): DataFrame = {
    val (pairs, cached) = minhashLshEdgesCached(docs, idCol, textCol, n, threshold)
    val comp = components(pairs, "id_a", "id_b", driverLimit = driverLimit)
    cached.foreach(_.unpersist())
    val withComp = docs
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("__comp", coalesce(col("component"), col(idCol)))
    val winners = withComp.groupBy(col("__comp"))
      .agg(max(struct(quality.as("q"), (-col(idCol)).as("negid"))).as("w"))
      .select((-col("w.negid")).as(idCol))
    docs.join(winners, Seq(idCol), "left_semi")
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, using
    * the band trick: split the 64-bit fingerprint into `maxHamming + 1`
    * segments — any pair within the distance must agree exactly on at
    * least one segment (pigeonhole), so candidates come from cheap
    * equality joins on segments.
    *
    * `maxBucket` caps degenerate segment values (e.g. a 16-bit segment
    * that is 0 for many short docs would otherwise make the equality
    * self-join quadratic): (seg, v) groups above the cap are dropped
    * before the join, same safety valve as [[minhashLshPairs]]. A pair is
    * lost only if every segment it agrees on is oversize — clusters of
    * that size belong to exact dedup. Recall note: with the default cap
    * of 10,000 this is lossless on corpora up to 10k docs per degenerate
    * segment value; the test corpora (≤5k docs) never hit it.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame =
    fingerprintPairs(
      docs.select(col(idCol).as("id"), simhash(col(textCol)).as("fp")),
      maxHamming, maxBucket)

  /** Near-dup pairs over ANY 64-bit fingerprint relation (id, fp) —
    * the segment-banding engine behind [[simhashPairs]] and the image
    * perceptual-hash dedup ([[graft.multimodal.Multimodal.imageNearDupPairs]]):
    * split the 64 bits into maxHamming+1 segments, candidates from
    * equality joins on segments (pigeonhole: a pair within the distance
    * agrees exactly on at least one segment), verified by hamming64.
    * Null fingerprints (undecodable payloads) drop out here.
    */
  def fingerprintPairs(fp0: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    val nSeg = maxHamming + 1
    val segBits = 64 / nSeg
    val fp = fp0.filter(col("fp").isNotNull)
    val segs = fp.select(col("id"), col("fp"),
      posexplode(transform(sequence(lit(0), lit(nSeg - 1)),
        s => call_function("shiftrightunsigned", col("fp"), s * segBits)
          .bitwiseAND(lit((1L << segBits) - 1)))).as(Seq("seg", "v")))
    // Cap via a window count over (seg, v): it rides the SAME shuffle
    // the equality self-join needs (exchange reuse, no second evaluation
    // of the fingerprints — measured ~2x faster than a separate
    // count+join pass). Skew note: a degenerate segment value lands its
    // rows on one task either way — the sort-merge join buffers exactly
    // the same partition — but filtering BEFORE the join caps the output
    // at linear instead of quadratic.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("seg", "v")
    val capped = segs.withColumn("__bc", count(lit(1)).over(w))
      .filter(col("__bc") <= maxBucket).drop("__bc")
    // hamming filter BEFORE distinct: hamming is a pure function of the
    // pair, so filtering first shrinks the dedup shuffle to matching
    // pairs only (the candidate set is typically much larger).
    capped.as("a").join(capped.as("b"),
        col("a.seg") === col("b.seg") && col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.fp"), col("b.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** FUZZY decontamination — the near-duplicate complement of exact
    * n-gram decontamination (t9): train documents whose n-gram Jaccard
    * against ANY reference (benchmark/eval) document reaches
    * `threshold`, found by CROSS MinHash-LSH banding. Paraphrased or
    * lightly-edited eval leakage defeats exact n-gram matching; it does
    * not defeat Jaccard at 0.5.
    *
    * Scale shape: the reference side is an eval suite — small by
    * definition — so its banded signature relation BROADCASTS and the
    * train side streams map-only through the candidate join; only
    * candidate (doc, ref) id pairs shuffle for the exact-Jaccard
    * verify. Recall at the default (64 bands × 2 rows): a pair at
    * jaccard j collides with prob 1−(1−j²)^64 ≥ 1−1e-8 at j ≥ 0.5 —
    * the d3 regime, so the exact pair set IS the expected output.
    * Returns (id, n_matches): train docs with ≥1 contaminated match.
    */
  def crossContamination(docs: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double, numHashes: Int = 128,
      bands: Int = 64, maxBucket: Int = 10000): DataFrame = {
    val rows = numHashes / bands
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    // persisted for the same reason as lshPairs' allSets: the train-side
    // sets feed the banded candidate join AND the verify join — one
    // materialization instead of two shingle derivations over the side
    // that is big by definition
    val docSets = docs.select(col(idCol).as("id"), shingleSet(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val refSets = ref.select(col(idCol).as("rid"), shingleSet(col(textCol), n).as("rsh"))
      .filter(size(col("rsh")) > 0)
    def banded(df: DataFrame, idName: String, shName: String) = df.select(col(idName),
      posexplode(bandHashes(minhashSignature(col(shName), numHashes), bands, rows))
        .as(Seq("band", "h")))
    // degenerate-bucket cap on the TRAIN side only (the broadcast ref
    // side is small); a train doc loses a pair only if every shared
    // band bucket is oversize — the simhashPairs safety valve. Unlike
    // the self-join pipelines there is no bucket shuffle to ride here
    // (the candidate join is broadcast), so the cap is a map-side-
    // combined count whose oversize list — typically empty — broadcasts
    // into an anti-join instead of a full window sort of the buckets.
    val docBuckets = banded(docSets, "id", "sh")
    val overCap = docBuckets.groupBy("band", "h").agg(count(lit(1)).as("__bc"))
      .filter(col("__bc") > maxBucket).select("band", "h")
    val cappedDoc = docBuckets.join(broadcast(overCap), Seq("band", "h"), "left_anti")
    val candidates = cappedDoc
      .join(broadcast(banded(refSets, "rid", "rsh")), Seq("band", "h"))
      .select("id", "rid").distinct()
    val inter = size(array_intersect(col("sh"), col("rsh"))).cast("double")
    val union = (size(col("sh")) + size(col("rsh"))).cast("double") - inter
    val out = candidates
      .join(docSets, "id")
      .join(broadcast(refSets), "rid")
      .filter(inter / union >= threshold)
      .groupBy("id").agg(count(lit(1)).as("n_matches"))
    unpersistAfterAction(out, Seq(docSets))
  }

  /** Sub-document (paragraph/unit) exact dedup — the RefinedWeb/FineWeb
    * pipeline stage that document-level dedup cannot replace: boilerplate
    * units (headers, footers, license blocks) repeat across MILLIONS of
    * otherwise-distinct documents, so each document is split into units,
    * the globally FIRST occurrence of each unit (min (doc, position))
    * survives, and every document is reassembled from its surviving
    * units in original order. Units here are fixed `unitWords`-word
    * chunks (this corpus carries no paragraph separators; a real crawl
    * would split on blank lines first and chunk within).
    *
    * Scale shape: the dedup shuffle carries ONLY (unit-hash, encoded
    * doc·position) — unit text never rides a shuffle; the keeper
    * election is a hash-aggregation min, and reassembly joins the
    * bounded keeper relation back against the per-doc units. Exactness
    * is modulo 64-bit unit-hash collisions (≪1e-9 at any realistic
    * corpus; a 100-TB deployment would widen to 128 bits), which is the
    * standard pipeline trade. Output: (id, text_dedup, units_total,
    * units_kept); documents whose every unit was seen earlier reassemble
    * to the empty string rather than vanishing.
    */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
      unitWords: Int = 8): DataFrame = {
    require(unitWords >= 1, "unitWords must be >= 1")
    val words = split(col(textCol), "\\s+")
    val nChunks = ceil(size(words).cast("double") / unitWords).cast("int")
    val chunks = when(size(words) <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(words, i * unitWords + 1, lit(unitWords)))))
    val units = docs.select(col(idCol).as("id"), posexplode(chunks).as(Seq("pos", "unit")))
    // (id, pos) encodes into one long so the keeper election is a plain
    // min over a primitive — no struct comparators in the shuffle
    val encoded = units.select(xxhash64(col("unit")).as("h"),
      (col("id") * lit(1000000L) + col("pos")).as("k"))
    val keepers = encoded.groupBy("h").agg(min(col("k")).as("k"))
    val kept = units
      .join(keepers,
        xxhash64(col("unit")) === keepers("h") &&
          (col("id") * lit(1000000L) + col("pos")) === keepers("k"))
      .select(col("id"), col("pos"), col("unit"))
    val rebuilt = kept.groupBy("id")
      .agg(
        concat_ws(" ", transform(array_sort(collect_list(struct(col("pos"), col("unit")))),
          s => s.getField("unit"))).as("text_dedup"),
        count(lit(1)).as("units_kept"))
    docs.select(col(idCol).as("id"), nChunks.cast("long").as("units_total"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        col("units_total"), coalesce(col("units_kept"), lit(0L)).as("units_kept"))
  }

  /** Exact substring-dedup REMOVAL (the Lee et al. '22 excision stage,
    * span-granular): where [[graft.text.CorpusScoring.duplicateSpans]]
    * only SCORES how duplicated a document is, this produces the
    * scrubbed corpus — every k-word span occurrence that also appears
    * earlier in the corpus (by (doc, position) order) has its words
    * excised; the globally FIRST occurrence of each span value keeps
    * its words; overlapping duplicate spans union their word ranges;
    * documents reassemble from the surviving words in order. The output
    * is a pure function of the corpus: (id, text_scrubbed, n_words,
    * n_removed).
    *
    * Unlike [[paragraphDedup]]'s fixed non-overlapping units, spans
    * here are OVERLAPPING k-grams, so a duplicated passage of any
    * length ≥ k is excised wholesale wherever it recurs (each of its
    * k-gram windows is a duplicate), while passages shorter than k
    * never match — the sliding-window semantics of the
    * suffix-array-based dedup, without building a distributed suffix
    * array.
    *
    * Scale shape: one corpus scan explodes the (id, pos, gram)
    * relation, persisted and reused for the keeper election and the
    * duplicate-flag join (same contract as duplicateSpans); the
    * election groups 8-byte gram HASHES against an encoded (id·C+pos)
    * primitive min — gram text never rides the election shuffle — and
    * carries each hash's occurrence count so the flag join is
    * [[graft.operators.SkewJoin.hotSplit]] (boilerplate spans ARE the
    * Zipf head; they resolve map-side against a broadcast). Word text
    * NEVER shuffles: removed indices aggregate to one bounded
    * array per affected doc (collect_set, ≤ doc length), one doc-keyed
    * join attaches it, and excision + reassembly happen map-side with
    * an index-aware array filter over the doc's own token array.
    */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4): DataFrame = {
    require(k >= 2, "a span needs at least 2 words")
    val enc = lit(1000000L) // positions per doc bounded by the encoding
    val base = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("ws"))
    val occ = base.filter(size(col("ws")) >= k)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), size(col("ws")) - k),
        p => concat_ws(" ", slice(col("ws"), p + 1, lit(k))))).as(Seq("pos", "g")))
      .select(col("id"), col("pos"), xxhash64(col("g")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // keeper election per span VALUE: min encoded (id, pos) — a span
    // occurring once elects itself, so `encoded != first` alone marks
    // exactly the non-first occurrences of duplicated spans; the
    // occurrence count rides along as the hotSplit head statistic
    val firsts = occ
      .select(col("h"), (col("id") * enc + col("pos")).as("k"))
      .groupBy("h").agg(min(col("k")).as("firstK"), count(lit(1)).as("occN"))
    val dup = graft.operators.SkewJoin
      .hotSplit(occ, firsts, "h", hotBy = col("occN"))
      .filter((col("id") * enc + col("pos")) =!= col("firstK"))
      .select(col("id"), col("pos"))
    // one bounded array of removed word indices per AFFECTED doc —
    // O(doc length) each, so the only doc-level state that shuffles
    val removed = dup
      .select(col("id"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("i"))
      .groupBy("id").agg(collect_set(col("i")).as("rm"))
    base
      .join(removed, Seq("id"), "left")
      .select(col("id"),
        when(col("ws").isNull, lit(""))
          .when(col("rm").isNull, concat_ws(" ", col("ws")))
          .otherwise(concat_ws(" ",
            filter(col("ws"), (_, i) => !array_contains(col("rm"), i))))
          .as("text_scrubbed"),
        when(col("ws").isNull, lit(0L)).otherwise(size(col("ws")).cast("long"))
          .as("n_words"),
        coalesce(size(col("rm")).cast("long"), lit(0L)).as("n_removed"))
  }

  /** Incremental exact dedup against a reference corpus (the "drop
    * everything we already trained on" shape): rows of `docs` whose text
    * does NOT appear in `ref`, with a Bloom filter doing almost all of
    * the work executor-side so the big side never shuffles.
    *
    * Phases: (1) one aggregation over the (small) reference side builds
    * a Bloom filter of text hashes; (2) the filter probes every doc
    * inside whole-stage codegen ([[graft.functions.BloomMightContainLong]])
    * — no false negatives, so probe-misses are EXACTLY new and pass
    * through with zero further work; (3) only probe-hits (true dups +
    * ~fpp false positives) are confirmed by a real join against the
    * reference texts, and the confirmed-new remainder is unioned back.
    * The result is exact; the join touches |dups| + fpp·|docs| rows
    * instead of |docs|.
    *
    * At 100 TB: the probed side streams map-only; the filter is built
    * once (~1.2 GB per 1e9 reference texts at 1% fpp — partition the
    * reference and probe k filters when it outgrows a broadcast).
    */
  /** PARTITIONED bloom dedup — the [[bloomDedup]] shape for reference
    * corpora whose single filter outgrows a broadcast (~1.2 GB per 1e9
    * texts: past a few billion, one bitmap per cluster node stops being
    * free). The hash space splits into `buckets`; each bucket
    * aggregates its OWN filter ([[graft.functions.BloomAgg]], partials
    * OR-merging map-side), and probes co-shuffle by the same bucket to
    * a SHUFFLE_HASH join — every task holds only its buckets' bitmaps,
    * deserialized once per (task, bucket), never per row. Null texts
    * and probe-misses pass through exactly as in [[bloomDedup]];
    * probe-hits take the same confirm anti-join. Results are EXACT and
    * identical to [[bloomDedup]] by construction (spec-pinned).
    */
  def bloomDedupPartitioned(docs: DataFrame, ref: DataFrame, textCol: String,
      buckets: Int = 64, fpp: Double = 0.01): DataFrame = {
    require(buckets > 0, "need a positive bucket count")
    val spark = docs.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    val refH = ref.filter(col(textCol).isNotNull)
      .select(xxhash64(col(textCol)).as("__h"))
      .withColumn("__b", pmod(col("__h"), lit(buckets)))
    val refDistinct = refH.agg(approx_count_distinct(col("__h")).as("u")).head().getLong(0)
    if (refDistinct == 0L) return docs
    val expectedPer = math.max((refDistinct * 1.2 / buckets).toLong, 64L)
    val blooms = refH.groupBy("__b")
      .agg(graft.functions.BloomExpressions.bloom_agg(col("__h"), expectedPer, fpp)
        .as("__bloom"))
    val docsB = docs
      .withColumn("__h", when(col(textCol).isNull, lit(null)).otherwise(xxhash64(col(textCol))))
      .withColumn("__b", when(col("__h").isNull, lit(-1)).otherwise(pmod(col("__h"), lit(buckets))))
    // SHUFFLE_HASH: broadcasting the bloom relation would re-create the
    // single-filter problem this variant exists to avoid
    val joined = docsB.join(blooms.hint("SHUFFLE_HASH"), Seq("__b"), "left")
    val outSchema = org.apache.spark.sql.types.StructType(
      joined.schema.fields.filterNot(f => f.name == "__bloom") :+
        org.apache.spark.sql.types.StructField("__hit", org.apache.spark.sql.types.BooleanType,
          nullable = false))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val bloomIdx = joined.schema.fieldIndex("__bloom")
    val hIdx = joined.schema.fieldIndex("__h")
    val bIdx = joined.schema.fieldIndex("__b")
    val flagged = joined.mapPartitions { rows =>
      // one deserialized filter per (task, bucket)
      val cache = scala.collection.mutable.Map.empty[Long, org.apache.spark.util.sketch.BloomFilter]
      rows.map { r =>
        val hit =
          if (r.isNullAt(hIdx) || r.isNullAt(bloomIdx)) false
          else {
            val f = cache.getOrElseUpdate(r.getLong(bIdx),
              org.apache.spark.util.sketch.BloomFilter.readFrom(
                new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](bloomIdx))))
            f.mightContainLong(r.getLong(hIdx))
          }
        Row.fromSeq(r.toSeq.patch(bloomIdx, Nil, 1) :+ hit)
      }
    }(enc).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cleanup = (df: DataFrame) => df.drop("__h", "__b", "__hit")
    val passThrough = cleanup(flagged.filter(!col("__hit")))
    val maybeDup = cleanup(flagged.filter(col("__hit")))
    val refTexts = ref.select(col(textCol)).filter(col(textCol).isNotNull).distinct()
    val confirmedNew = maybeDup.join(refTexts, Seq(textCol), "left_anti")
    passThrough.unionByName(confirmedNew)
  }

  def bloomDedup(docs: DataFrame, ref: DataFrame, textCol: String,
      fpp: Double = 0.01): DataFrame = {
    val refHashes = ref.filter(col(textCol).isNotNull)
      .select(xxhash64(col(textCol)).as("__h"))
    // Build-side cost is two SHUFFLE-FREE passes over the raw reference:
    // an approximate distinct count to size the filter (duplicate hashes
    // are no-ops to a bloom, so exact cardinality is unnecessary — a 20%
    // headroom absorbs the sketch error), then the bloom aggregation
    // itself (partial filters OR-merged, only bitmaps move). The exact
    // distinct of the reference runs once, lazily, inside the confirm
    // join below — the only shuffle of reference texts anywhere.
    val refDistinct = refHashes.agg(approx_count_distinct(col("__h")).as("u")).head().getLong(0)
    // empty reference: nothing can be a duplicate (also, Spark's
    // stat.bloomFilter NPEs aggregating zero rows — the streaming
    // dedup-on-ingest path hits this on a table's very first batch)
    if (refDistinct == 0L) return docs
    val expected = math.max((refDistinct * 1.2).toLong, 64L)
    val bloom = refHashes.stat.bloomFilter("__h", expected, fpp)
    // one broadcast of the filter, one shared probe expression: both
    // branches below carry only the broadcast handle, so the (possibly
    // GB-scale) bitmap crosses the cluster once
    val probe = graft.functions.BloomExpressions
      .bloom_might_contain_long(xxhash64(col(textCol)), bloom)
    // one scan for the pass-through side: null-text rows (SQL NOT EXISTS
    // semantics keep them — they can never equal a reference text; the
    // probe itself is null on them) merge with probe-misses, which are
    // exactly new (no false negatives)
    val passThrough = docs.filter(
      when(col(textCol).isNull, lit(true)).otherwise(!probe))
    val maybeDup = docs.filter(col(textCol).isNotNull && probe)
    val refTexts = ref.select(col(textCol)).filter(col(textCol).isNotNull).distinct()
    val confirmedNew = maybeDup.join(refTexts, Seq(textCol), "left_anti")
    passThrough.unionByName(confirmedNew)
  }
}
