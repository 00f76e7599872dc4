package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal
import graft.vectors.VectorFunctions

/** Similarity search over the embeddings table and multimodal binary
  * plumbing over documents.
  */
object VectorQueries {

  import QueryDef._

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Per-JVM memo of the trained IVF quantizer, keyed by sf dir. */
  private val trainedCentroids =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** Per-JVM memo of the trained PQ codebooks, keyed by sf dir. */
  private val trainedCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, graft.functions.PqCodebooks]()

  /** Per-JVM memo of a persisted IVF-PQ index dir, keyed by sf dir. */
  private val builtIvfPqIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-JVM memo of the table-synced IVF index (v16), keyed by sf dir. */
  private val syncedIvfIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val defs: Map[String, QueryDef] = Map(

    // V8 — FILTERED kNN (metadata predicate + top-k, the RAG
    // retrieval shape): top-10 among label=1 vectors only. The exact
    // allowed-set count gates the strategy; at this selectivity the
    // broadcast-semi-join + brute path runs (exact by construction,
    // hence oracle-able); the dense-filter IVF path is recall-panel
    // spec'd in VectorsSpec.
    "v8_knn_filtered" -> withOracle(
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 3
        |), scored AS (
        |  SELECT vec_id,
        |         list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qv) AS sim
        |  FROM embeddings, q WHERE vec_id <> 3 AND label = 1
        |)
        |SELECT vec_id, ROUND(sim, 6) AS sim_r
        |FROM scored
        |ORDER BY sim DESC, vec_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      VectorFunctions.knnFiltered(
          e.filter(col("vec_id") =!= 3), "vec_id", "embedding",
          e.filter(col("vec_id") =!= 3 && col("label") === 1).select("vec_id"),
          e.filter(col("vec_id") === 3), "embedding", k = 10)
        .select(col("id").as("vec_id"), round(col("sim"), 6).as("sim_r"))
    },

    // V10 — BATCHED exact kNN: three query vectors in one corpus pass,
    // top-8 each, via the mergeable top_k aggregate (O(queries × k)
    // shuffle — never the queries × corpus relation a windowed
    // translation would move; that window IS the oracle below, which
    // only the sf-sized DuckDB run can afford).
    "v10_knn_batch" -> withOracle(
      """WITH q AS (
        |  SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id < 3
        |), scored AS (
        |  SELECT q.qid, e.vec_id,
        |         list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv) AS sim
        |  FROM embeddings e, q WHERE e.vec_id >= 3
        |), ranked AS (
        |  SELECT qid, vec_id, sim,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        |  FROM scored
        |)
        |SELECT qid, vec_id, ROUND(sim, 6) AS sim_r, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 8
        |ORDER BY qid, rank""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      VectorFunctions.knnBruteBatch(
          e.filter(col("vec_id") >= 3), "vec_id", "embedding",
          e.filter(col("vec_id") < 3), "vec_id", "embedding", k = 8)
        .select(col("qid"), col("id").as("vec_id"),
          round(col("sim"), 6).as("sim_r"), col("rank"))
        .orderBy("qid", "rank")
    },

    // V1 — exact brute-force cosine top-k for the vec_id=0 query vector.
    "v1_knn_brute" -> withOracle(
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 0
        |), scored AS (
        |  SELECT vec_id,
        |         list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qv) AS sim
        |  FROM embeddings, q WHERE vec_id <> 0
        |)
        |SELECT vec_id, ROUND(sim, 6) AS sim_r
        |FROM scored
        |ORDER BY sim DESC, vec_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      VectorFunctions.knnBrute(
          e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          e.filter(col("vec_id") === 0), "embedding", k = 10)
        .select(col("id").as("vec_id"), round(col("sim"), 6).as("sim_r"))
    },

    // V2 — LSH-bucketed approximate top-k (scale path). The hyperplanes
    // are LCG-derived plain-integer arithmetic (VectorOps.weight), so the
    // DuckDB oracle reproduces the exact buckets and candidate set —
    // the same playbook as v3 below, here with bits=12, tables=4.
    // KNOWN ASSUMPTION (here and v3): both engines must agree on the sign
    // of every hyperplane projection; the summation orders differ, so a
    // projection within an ulp of zero could in principle bucket
    // differently. Weights are ±1000-scale integers against ~unit floats,
    // making a near-zero 64-term sum vanishingly unlikely; accepted.
    "v2_knn_lsh" -> withOracle(
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |),
        |pl AS (SELECT t.range AS t, p.range AS p FROM range(4) t, range(12) p),
        |proj AS (
        |  SELECT v.vec_id, pl.t, pl.p,
        |         sum(v.ev[d.range + 1] *
        |             (((pl.t*1000003 + pl.p*7919 + d.range)*2654435761 + 1013904223) % 2001 - 1000)) AS proj
        |  FROM v, pl, range(64) d
        |  GROUP BY 1, 2, 3
        |),
        |sig AS (
        |  SELECT vec_id, t*4096 + sum(CASE WHEN proj > 0 THEN 1<<p ELSE 0 END) AS s
        |  FROM proj GROUP BY vec_id, t
        |),
        |cand AS (
        |  SELECT DISTINCT a.vec_id
        |  FROM sig a JOIN sig q ON a.s = q.s AND q.vec_id = 0
        |  WHERE a.vec_id <> 0
        |),
        |scored AS (
        |  SELECT c.vec_id, list_cosine_similarity(va.ev, qv.ev) AS sim
        |  FROM cand c JOIN v va ON c.vec_id = va.vec_id JOIN v qv ON qv.vec_id = 0
        |)
        |SELECT vec_id, ROUND(sim, 6) AS sim_r
        |FROM scored
        |ORDER BY sim DESC, vec_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      VectorFunctions.knnLsh(
          e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          e.filter(col("vec_id") === 0), "embedding", k = 10)
        .select(col("id").as("vec_id"), round(col("sim"), 6).as("sim_r"))
    },

    // V4 — IVF coarse-quantizer kNN with TRAINED centroids: distributed
    // spherical k-means (deterministic k-means|| init + Lloyd), probe
    // the 12 of 16 cells nearest the query, exact rescore within them.
    // Trained centroids cannot be replayed in SQL, so the oracle is the
    // EXACT brute-force top-k: the row only passes when trained IVF
    // achieves perfect recall on this query — a strictly stronger gate
    // than replaying the probe arithmetic. The test embeddings are
    // near-random (the HARD regime: neighbors are barely cell-local),
    // so (query=vec_id 7, k=5, nprobe=12) is pinned where exact recall
    // holds at BOTH verified sfs — sf0.01 is exact from nprobe=4 up,
    // sf0.1 from nprobe=10 up; VectorsSpec replays this gate and
    // additionally gates mean recall@10 >= 0.9 over a 20-query panel on
    // clustered data, where nprobe=4 of 16 suffices — cell-locality,
    // not probe width, is what real corpora supply.
    // v1 covers vec_id 0, so this row also diversifies the query.
    "v4_knn_ivf" -> withOracle(
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 7
        |), scored AS (
        |  SELECT vec_id,
        |         list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qv) AS sim
        |  FROM embeddings, q WHERE vec_id <> 7
        |)
        |SELECT vec_id, ROUND(sim, 6) AS sim_r
        |FROM scored
        |ORDER BY sim DESC, vec_id
        |LIMIT 5""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      // centroids memoized per sf dir (training is deterministic, so a
      // re-run trains the identical matrix): the build-artifact shape —
      // train once, serve every query from the persisted quantizer
      val cents = trainedCentroids.computeIfAbsent(dir, { _ =>
        VectorFunctions.trainKmeansCentroids(
          e.filter(col("vec_id") =!= 7), "vec_id", "embedding", k = 16)
      })
      VectorFunctions.knnIvfTrained(
          e.filter(col("vec_id") =!= 7), "vec_id", "embedding",
          e.filter(col("vec_id") === 7), "embedding", k = 5, cents, nprobe = 12)
        .select(col("id").as("vec_id"), round(col("sim"), 6).as("sim_r"))
    },

    // V6 — product-quantization kNN (Jégou '11): the corpus compresses
    // to m=16 one-byte codes per 64-dim vector (16×), the query scores
    // every code row with 16 table lookups (ADC), and the rerank-best
    // candidates are exact-rescored. Trained codebooks cannot be
    // replayed in SQL, so — the v4 playbook — the oracle is the EXACT
    // brute-force top-k: the row passes only when PQ+rerank achieves
    // perfect recall on this pinned query (vec_id=11, k=5, rerank=256 —
    // exact at BOTH verified sfs: sf0.01 from rerank=32 up, sf0.1 from
    // rerank=256; near-random embeddings bury the tiny cosine spreads
    // under 4-bit subspace quantization error, so rerank absorbs it.
    // VectorsSpec replays this gate and additionally gates mean
    // recall@10 >= 0.9 over a 20-query panel on clustered data at
    // rerank=50).
    "v6_knn_pq" -> withOracle(
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 11
        |), scored AS (
        |  SELECT vec_id,
        |         list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qv) AS sim
        |  FROM embeddings, q WHERE vec_id <> 11
        |)
        |SELECT vec_id, ROUND(sim, 6) AS sim_r
        |FROM scored
        |ORDER BY sim DESC, vec_id
        |LIMIT 5""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val cb = trainedCodebooks.computeIfAbsent(dir, { _ =>
        VectorFunctions.trainPqCodebooks(
          e.filter(col("vec_id") =!= 11), "vec_id", "embedding", m = 16, ksub = 16)
      })
      VectorFunctions.knnPq(
          e.filter(col("vec_id") =!= 11), "vec_id", "embedding",
          e.filter(col("vec_id") === 11), "embedding", k = 5, cb, rerank = 256)
        .select(col("id").as("vec_id"), round(col("sim"), 6).as("sim_r"))
    },

    // V7 — the COMPOSED IVF-PQ index (IVFADC, Jégou '11 §III — the
    // FAISS-standard 100-TB ANN architecture): residual PQ codes live
    // INSIDE the persisted IVF cell lists, a query prunes to nprobe
    // cells, ADC-scores only those cells' codes (m byte lookups + the
    // per-cell dot(q̂,c) recomposition term), and exact-reranks the best
    // `rerank`. Neither the trained quantizer nor the codebooks can be
    // replayed in SQL, so — the v4/v6 playbook — the oracle is the EXACT
    // brute-force top-k: the row passes only when the composed index
    // achieves perfect recall on this pinned query (vec_id=13, k=5,
    // ksub=256 — FAISS's default 8-bit codes, same 16-byte code rows —
    // nprobe=12, rerank=64; exact at BOTH verified sfs: sf0.01 from
    // nprobe=6/rerank=64 up, sf0.1 from nprobe=12/rerank=64. These
    // near-random embeddings are the adversarial case for a residual
    // quantizer — cell-local structure is weak, so probe width carries
    // the recall; VectorsSpec's clustered panel holds >= 0.9 at
    // nprobe=4 of 16, the regime real corpora supply).
    "v7_knn_ivfpq" -> withOracle(
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 13
        |), scored AS (
        |  SELECT vec_id,
        |         list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qv) AS sim
        |  FROM embeddings, q WHERE vec_id <> 13
        |)
        |SELECT vec_id, ROUND(sim, 6) AS sim_r
        |FROM scored
        |ORDER BY sim DESC, vec_id
        |LIMIT 5""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      // the index is a build-once serve-many artifact: built (and
      // persisted) the first time a session queries this sf dir
      val idx = builtIvfPqIndexes.computeIfAbsent(dir, { _ =>
        val d = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
        VectorFunctions.buildIvfPqIndex(
          e.filter(col("vec_id") =!= 13), "vec_id", "embedding", d,
          nCentroids = 16, m = 16, ksub = 256)
        d
      })
      VectorFunctions.knnIvfPqIndex(s, idx,
          e.filter(col("vec_id") === 13), "embedding", k = 5, nprobe = 12, rerank = 64)
        .select(col("id").as("vec_id"), round(col("sim"), 6).as("sim_r"))
    },

    // V16 — MUTABLE persisted-index consistency (the serve-from-index
    // DELETE/UPSERT loop a production ANN deployment runs): an IVF
    // index is built FROM a graft table, the table then absorbs
    // appends, redundant re-ingests (upserts), and row-key DELETEs, and
    // syncIndexWithTable reconciles the index from the table's batch
    // CDC feeds — logical tombstones shadow every touched id, winners
    // re-append at a higher maintenance seq. The serve probes ALL
    // nCentroids cells (nprobe = 16 = nCentroids ⇒ the scan is
    // exhaustive over LIVE entries, so the result is EXACT and the
    // oracle is plain brute force over the table's final state: all
    // ids except the deleted ones). A broken delete (stale id served),
    // broken upsert shadow (duplicate rows), or missed append all
    // hash-mismatch.
    "v16_index_sync" -> withOracle(
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 7
        |), scored AS (
        |  SELECT vec_id,
        |         list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qv) AS sim
        |  FROM embeddings, q WHERE vec_id <> 7 AND vec_id % 10 <> 3
        |)
        |SELECT vec_id, ROUND(sim, 6) AS sim_r
        |FROM scored
        |ORDER BY sim DESC, vec_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val idx = syncedIvfIndexes.computeIfAbsent(dir, { _ =>
        import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
        val base = java.nio.file.Files.createTempDirectory("graft-ivf-sync").toString
        val schema = graft.core.GraftSchema(
          rowKeys = Seq(graft.core.GraftField("vec_id", LongType)),
          sortKeys = Nil,
          values = Seq(graft.core.GraftField("embedding", ArrayType(FloatType))))
        val corpus = e.filter(col("vec_id") =!= 7).select("vec_id", "embedding")
        val table = graft.table.GraftTable.create(s, s"$base/table", schema)
        table.ingest(corpus.filter(col("vec_id") % 5 =!= 4))
        VectorFunctions.buildIvfIndexFromTable(table, "vec_id", "embedding",
          s"$base/index", nCentroids = 16)
        // post-build mutations: append the held-out ids, re-ingest
        // (upsert) every ≡0 (mod 7) id, delete every ≡3 (mod 10) id
        table.ingest(corpus.filter(col("vec_id") % 5 === 4))
        table.ingest(corpus.filter(col("vec_id") % 7 === 0))
        table.deleteKeys(corpus.filter(col("vec_id") % 10 === 3).select("vec_id"))
        VectorFunctions.syncIndexWithTable(table, "vec_id", "embedding", s"$base/index")
        s"$base/index"
      })
      VectorFunctions.knnIvfIndex(s, idx, e.filter(col("vec_id") === 7), "embedding",
          k = 10, nprobe = 16)
        .select(col("id").as("vec_id"), round(col("sim"), 6).as("sim_r"))
    },

    // V3 — embedding near-dup pairs via hyperplane-LSH bucketing with
    // exact-cosine rescore — the scale path (no cartesian anywhere; the
    // brute-force all-pairs variant survives only as the recall oracle
    // in VectorsSpec). The hyperplanes are derived from a plain-integer
    // LCG, so the DuckDB oracle reproduces the IDENTICAL buckets,
    // candidates, and rescored pairs — the oracle checks the whole LSH
    // pipeline, not just the final filter.
    "v3_embed_neardup" -> withOracle(
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |),
        |pl AS (SELECT t.range AS t, p.range AS p FROM range(12) t, range(8) p),
        |hp AS (
        |  SELECT t, p,
        |         list_transform(range(64), d ->
        |           CAST((((t*1000003 + p*7919 + d)*2654435761 + 1013904223) % 2001 - 1000) AS DOUBLE)) AS w
        |  FROM pl
        |),
        |proj AS (
        |  SELECT v.vec_id, hp.t, hp.p, list_dot_product(v.ev, hp.w) AS proj
        |  FROM v, hp
        |),
        |sig AS (
        |  SELECT vec_id, t*256 + sum(CASE WHEN proj > 0 THEN 1<<p ELSE 0 END) AS s
        |  FROM proj GROUP BY vec_id, t
        |),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM sig a JOIN sig b ON a.s = b.s AND a.vec_id < b.vec_id
        |),
        |av AS (SELECT vec_id, CAST(ev AS DOUBLE[64]) AS arr FROM v)
        |SELECT c.id_a, c.id_b
        |FROM cand c JOIN av va ON c.id_a = va.vec_id JOIN av vb ON c.id_b = vb.vec_id
        |WHERE array_cosine_similarity(va.arr, vb.arr) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      VectorFunctions.nearDupPairsLsh(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.3, bits = 8, tables = 12)
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    },

    // V5 — embedding-cluster dedup (SemDeDup shape): the v3 LSH pair
    // pipeline → connected components → smallest vec_id survives per
    // cluster. The oracle replays the identical pair generation (same
    // LCG hyperplanes as v3, so the candidate set matches bit-for-bit)
    // and closes it with a recursive CTE, the d5 playbook on vectors.
    "v5_embed_dedup" -> withOracle(
      """WITH RECURSIVE v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |),
        |pl AS (SELECT t.range AS t, p.range AS p FROM range(12) t, range(8) p),
        |hp AS (
        |  SELECT t, p,
        |         list_transform(range(64), d ->
        |           CAST((((t*1000003 + p*7919 + d)*2654435761 + 1013904223) % 2001 - 1000) AS DOUBLE)) AS w
        |  FROM pl
        |),
        |proj AS (
        |  SELECT v.vec_id, hp.t, hp.p, list_dot_product(v.ev, hp.w) AS proj
        |  FROM v, hp
        |),
        |sig AS (
        |  SELECT vec_id, t*256 + sum(CASE WHEN proj > 0 THEN 1<<p ELSE 0 END) AS s
        |  FROM proj GROUP BY vec_id, t
        |),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM sig a JOIN sig b ON a.s = b.s AND a.vec_id < b.vec_id
        |),
        |av AS (SELECT vec_id, CAST(ev AS DOUBLE[64]) AS arr FROM v),
        |pairs AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cand c JOIN av va ON c.id_a = va.vec_id JOIN av vb ON c.id_b = vb.vec_id
        |  WHERE array_cosine_similarity(va.arr, vb.arr) >= 0.3
        |),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |),
        |reach(id, lab) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.id
        |)
        |SELECT id AS vec_id FROM reach
        |GROUP BY id HAVING MIN(lab) = id
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      VectorFunctions.clusterDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.3, bits = 8, tables = 12)
        .select("vec_id")
        .orderBy("vec_id")
    },

    // V9 — k-means-partitioned semantic dedup (the SemDeDup paper's
    // shape): nearest-centroid assignment (codegen, shuffle-free), then
    // near-dup pruning confined to within each cluster — the move that
    // makes semantic dedup ~linear at corpus scale. Centroids here are
    // the first 16 vectors (deterministic), so the oracle replays the
    // identical argmax-cosine assignment (centroids are L2-normalized
    // in the Spark path; cosine is norm-invariant, so argmax matches),
    // the same smallest-id-on-tie rule, and the same within-cluster
    // smaller-id-neighbor drop predicate. KNOWN ASSUMPTION (the
    // v2/v3 precedent): both engines must agree on double-precision
    // cosine comparisons; argmax/threshold flips need two values within
    // an ulp — vanishingly unlikely and accepted.
    "v9_semantic_dedup" -> withOracle(
      """WITH v AS (
        |  SELECT vec_id, CAST(list_transform(embedding, x -> CAST(x AS DOUBLE)) AS DOUBLE[64]) AS ev
        |  FROM embeddings
        |), c AS (
        |  SELECT vec_id AS cid, ev AS cv FROM v WHERE vec_id < 16
        |), assign AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT v.vec_id, c.cid AS cluster,
        |           ROW_NUMBER() OVER (PARTITION BY v.vec_id
        |             ORDER BY array_cosine_similarity(v.ev, c.cv) DESC, c.cid) AS rn
        |    FROM v, c) WHERE rn = 1
        |), pruned AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM assign a JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  JOIN v va ON va.vec_id = a.vec_id
        |  JOIN v vb ON vb.vec_id = b.vec_id
        |  WHERE array_cosine_similarity(va.ev, vb.ev) >= 0.3
        |)
        |SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster
        |FROM assign a
        |WHERE a.vec_id NOT IN (SELECT vec_id FROM pruned)
        |ORDER BY a.vec_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val rows = e.filter(col("vec_id") < 16).orderBy("vec_id")
        .select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      val m = graft.functions.CentroidMatrix.normalized(rows)
      VectorFunctions.semanticDedup(e, "vec_id", "embedding", m, threshold = 0.3)
        .select(col("id").as("vec_id"), col("cluster"))
        .orderBy("vec_id")
    },

    // MM1 — multimodal metadata decode: binary payload column ->
    // partition-batched decode (stubbed codec, see Multimodal scaladoc)
    // -> typed metadata; the stub's arithmetic is reproduced in SQL.
    // MM1 — REAL header decode: each document becomes a spec-conformant
    // PNG/JPEG/GIF binary (by doc_id), or deliberate garbage for every
    // tenth id; Multimodal.decodeMeta parses the actual bytes with
    // ImageCodec, and the oracle predicts format/dims/channels from the
    // same arithmetic the encoder used — so a wrong magic check, a
    // byte-order slip (GIF is LE, PNG BE), or a broken marker walk
    // (JPEG's APP0 skip) all show up as a driver mismatch.
    "mm1_multimodal_meta" -> withOracle(
      """SELECT doc_id AS id,
        |       CASE WHEN doc_id % 10 = 9 THEN NULL
        |            WHEN doc_id % 3 = 0 THEN 'png'
        |            WHEN doc_id % 3 = 1 THEN 'jpeg'
        |            ELSE 'gif' END AS format,
        |       CASE WHEN doc_id % 10 = 9 THEN NULL
        |            ELSE CAST(1 + doc_id % 640 AS INT) END AS width,
        |       CASE WHEN doc_id % 10 = 9 THEN NULL
        |            ELSE CAST(1 + (doc_id * 3) % 480 AS INT) END AS height,
        |       CASE WHEN doc_id % 10 = 9 THEN NULL
        |            WHEN doc_id % 3 = 0 THEN CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS INT)
        |            WHEN doc_id % 3 = 1 THEN CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT)
        |            ELSE CAST(3 AS INT) END AS channels
        |FROM documents
        |ORDER BY id""".stripMargin) { (s, dir) =>
      val mkContent = udf { (id: Long) =>
        val w = (1 + id % 640).toInt
        val h = (1 + (id * 3) % 480).toInt
        if (id % 10 == 9) s"not an image $id".getBytes("UTF-8")
        else (id % 3) match {
          case 0 => graft.multimodal.ImageCodec.pngBytes(w, h, colorType = if (id % 2 == 0) 2 else 6)
          case 1 => graft.multimodal.ImageCodec.jpegBytes(w, h, components = if (id % 2 == 0) 1 else 3)
          case _ => graft.multimodal.ImageCodec.gifBytes(w, h)
        }
      }
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), mkContent(col("doc_id")).as("content"))
      Multimodal.decodeMeta(docs, "doc_id", "content").orderBy("id")
    },

    // MM3 — image perceptual-hash near-dup: every document becomes a
    // REAL 9×8 24-bit BMP (decoded by javax.imageio — an actual pixel
    // decode, not a header parse) whose grays are a deterministic
    // function of a BASE id; ids with doc_id % 5 = 1 reuse the previous
    // id's base, so (5k, 5k+1) are pixel-identical pairs, and every
    // doc_id % 10 = 7 payload is garbage (hashes to null, must drop
    // out). The Spark side runs the full pipeline — ImageIO decode →
    // area-average 9×8 luminance → 64-bit dHash → segment-banding
    // candidates (lossless at maxHamming=3 by pigeonhole) → exact
    // Hamming verify; the oracle replays the gray arithmetic and dHash
    // bit-packing in SQL (two 32-bit halves: 1<<63 would overflow
    // BIGINT) and takes ALL pairs within Hamming 3 exhaustively — so a
    // decoder slip, a resize-grid bug, a bit-order mismatch, or a lost
    // banding candidate all surface as a driver mismatch.
    "mm3_image_neardup" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 1 THEN doc_id - 1 ELSE doc_id END AS base
        |  FROM documents WHERE doc_id % 10 <> 7
        |), g AS (
        |  SELECT d.doc_id, x.range AS x, y.range AS y,
        |         (d.base * 2654435761 + (y.range * 9 + x.range) * 1013904223) % 256 AS gray
        |  FROM d, range(9) x, range(8) y
        |), bits AS (
        |  SELECT a.doc_id, a.y * 8 + a.x AS pos,
        |         CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
        |  FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 8
        |), h AS (
        |  SELECT doc_id,
        |         SUM(CASE WHEN pos < 32 THEN bit * (CAST(1 AS BIGINT) << pos) ELSE 0 END) AS lo,
        |         SUM(CASE WHEN pos >= 32 THEN bit * (CAST(1 AS BIGINT) << (pos - 32)) ELSE 0 END) AS hi
        |  FROM bits GROUP BY doc_id
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val mkImg = udf { (id: Long) =>
        if (id % 10 == 7) s"garbage payload $id".getBytes("UTF-8")
        else {
          val base = if (id % 5 == 1) id - 1 else id
          graft.multimodal.ImageCodec.bmpBytes(9, 8,
            (x, y) => ((base * 2654435761L + (y * 9 + x) * 1013904223L) % 256).toInt)
        }
      }
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), mkImg(col("doc_id")).as("content"))
      Multimodal.imageNearDupPairs(docs, "doc_id", "content", maxHamming = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    },

    // MM4 — audio/video metadata decode: each document becomes a real
    // WAV (RIFF chunk walk) or MP4 (ISO-BMFF box walk to mvhd), or
    // garbage for every tenth id; AudioCodec parses the actual bytes
    // and the oracle predicts rate/channels/duration from the same
    // integer arithmetic the encoder used — a byte-order slip (WAV is
    // LE, MP4 BE), a chunk-alignment bug, or a wrong mvhd offset all
    // surface as a driver mismatch.
    "mm4_media_meta" -> withOracle(
      """SELECT doc_id AS id,
        |       CASE WHEN doc_id % 10 = 9 THEN NULL
        |            WHEN doc_id % 3 = 0 THEN 'wav' ELSE 'mp4' END AS format,
        |       CASE WHEN doc_id % 10 = 9 THEN NULL
        |            WHEN doc_id % 3 = 0 THEN CAST(8000 + (doc_id % 8) * 1000 AS INT)
        |            ELSE CAST(1000 + (doc_id % 10) * 100 AS INT) END AS rate,
        |       CASE WHEN doc_id % 10 = 9 OR doc_id % 3 <> 0 THEN NULL
        |            ELSE CAST(1 + doc_id % 2 AS INT) END AS channels,
        |       CASE WHEN doc_id % 10 = 9 THEN NULL
        |            WHEN doc_id % 3 = 0
        |              THEN (16 + doc_id % 50) * 1000 // (8000 + (doc_id % 8) * 1000)
        |            ELSE ((doc_id * 7) % 100000) * 1000 // (1000 + (doc_id % 10) * 100)
        |            END AS duration_ms
        |FROM documents
        |ORDER BY id""".stripMargin) { (s, dir) =>
      val mkMedia = udf { (id: Long) =>
        if (id % 10 == 9) s"not media $id".getBytes("UTF-8")
        else if (id % 3 == 0) {
          val rate = (8000 + (id % 8) * 1000).toInt
          val ch = (1 + id % 2).toInt
          val frames = (16 + id % 50).toInt
          graft.multimodal.AudioCodec.wavBytes(rate, ch,
            Array.fill[Short](frames * ch)(0))
        } else {
          graft.multimodal.AudioCodec.mp4Bytes(
            (1000 + (id % 10) * 100).toInt, (id * 7) % 100000)
        }
      }
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), mkMedia(col("doc_id")).as("content"))
      Multimodal.decodeMediaMeta(docs, "doc_id", "content").orderBy("id")
    },

    // MM5 — exact PCM DSP features: every document becomes a real
    // 16-bit mono WAV whose samples are a deterministic function of the
    // id; audioStats runs the genuine decode (chunk walk + LE16 sample
    // extraction) and the all-integer energy / zero-crossing math, and
    // the oracle regenerates the samples arithmetically and replays
    // both statistics exactly. Garbage payloads (id % 7 = 6) must
    // yield null stats.
    "mm5_audio_stats" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
        |), g AS (
        |  SELECT doc_id, i,
        |         (doc_id * 2654435761 + i * 1013904223) % 65536 - 32768 AS v
        |  FROM (SELECT doc_id, unnest(range(n)) AS i FROM d WHERE doc_id % 7 <> 6)
        |), zc AS (
        |  SELECT a.doc_id,
        |         SUM(CASE WHEN (a.v < 0) <> (b.v < 0) THEN 1 ELSE 0 END) AS z
        |  FROM g a JOIN g b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  GROUP BY a.doc_id
        |)
        |SELECT d.doc_id AS id,
        |       CASE WHEN d.doc_id % 7 = 6 THEN NULL ELSE d.n END AS n_samples,
        |       CASE WHEN d.doc_id % 7 = 6 THEN NULL
        |            ELSE (SELECT SUM(v * v) FROM g WHERE g.doc_id = d.doc_id)
        |            END AS sum_squares,
        |       CASE WHEN d.doc_id % 7 = 6 THEN NULL ELSE zc.z END AS zero_crossings
        |FROM d LEFT JOIN zc ON zc.doc_id = d.doc_id
        |ORDER BY id""".stripMargin) { (s, dir) =>
      val mkWav = udf { (id: Long) =>
        if (id % 7 == 6) s"static noise $id".getBytes("UTF-8")
        else {
          val n = (64 + id % 64).toInt
          val samples = Array.tabulate[Short](n)(i =>
            ((id * 2654435761L + i.toLong * 1013904223L) % 65536L - 32768L).toShort)
          graft.multimodal.AudioCodec.wavBytes(16000, 1, samples)
        }
      }
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), mkWav(col("doc_id")).as("content"))
      Multimodal.audioStats(docs, "doc_id", "content").orderBy("id")
    },

    // MM2 — multimodal feature extraction (stubbed model, batched
    // mapPartitions). The stub accumulates per-byte integer hashes
    // position-wise (order-independent), so the oracle replays it in
    // SQL; the query integerises the float features (exact: sums <<
    // 2^24) into one BIGINT column per dimension.
    "mm2_multimodal_features" -> withOracle {
      val fcols = (0 until 8).map(j =>
        s"       CAST(COALESCE(SUM(CASE WHEN i % 8 = $j THEN v END), 0) AS BIGINT) AS f$j")
        .mkString(",\n")
      s"""WITH pos AS (
         |  SELECT doc_id, unnest(range(length(text))) AS i FROM documents
         |), terms AS (
         |  SELECT doc_id, i,
         |         (CAST(unicode(substr(text, CAST(i AS INT) + 1, 1)) AS BIGINT) * 2654435761
         |          + i * 1013904223) % 1000 AS v
         |  FROM pos JOIN documents USING (doc_id)
         |)
         |SELECT doc_id AS id,
         |$fcols
         |FROM terms GROUP BY doc_id ORDER BY id""".stripMargin
    } { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      Multimodal.extractFeatures(docs, "doc_id", "content", dim = 8)
        .select(col("id") +: (0 until 8).map(j =>
          expr(s"CAST(round(features[$j] * 1000) AS BIGINT)").as(s"f$j")): _*)
        .orderBy("id")
    },

    // V11 — SQ8 scalar-quantized kNN: vectors compress 4× (one double
    // scale + dim int8 codes) and serving scores EXACT integer dot
    // products in a compiled byte-loop — faiss's SQ8 shape, the
    // memory-bound middle ground between full floats (v1) and PQ codes
    // (v6). Because the quantizer is the closed form
    // floor(x·127/max|x| + 0.5) and the code dot is integer (order-
    // independent — no float-summation divergence), the DuckDB oracle
    // replays the ENTIRE pipeline bit-exactly: quantization, the
    // integer dot, and the rescaled score — a stronger check than the
    // rounded-cosine rows. Ties break toward the smaller id on both
    // engines.
    // V12 — IVF-SQ8: the training-free compressed index — IVF cell
    // partitioning (v4's trained quantizer) with SQ8 int8 codes scored
    // by the exact-integer byte-loop inside only the probed cells, then
    // exact rerank of the shortlist. The faiss IVF-SQ composition:
    // probed-fraction IO bounds like v4, 4× byte compression like v11,
    // and NO codebook training (the operational edge over PQ when
    // distributions drift). Oracle — the v4/v6 playbook — is the exact
    // brute-force top-k: the row passes only when the compressed probe
    // achieves perfect recall on the pinned query (nprobe=12,
    // rerank=256, exact at both verified sfs and ×10).
    "v12_knn_ivfsq8" -> withOracle(
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 13
        |), scored AS (
        |  SELECT vec_id,
        |         list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qv) AS sim
        |  FROM embeddings, q WHERE vec_id <> 13
        |)
        |SELECT vec_id, ROUND(sim, 6) AS sim_r
        |FROM scored
        |ORDER BY sim DESC, vec_id
        |LIMIT 5""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val cents = trainedCentroids.computeIfAbsent(dir, { _ =>
        VectorFunctions.trainKmeansCentroids(
          e.filter(col("vec_id") =!= 7), "vec_id", "embedding", k = 16)
      })
      VectorFunctions.knnIvfSq8(
          e.filter(col("vec_id") =!= 13), "vec_id", "embedding",
          e.filter(col("vec_id") === 13), "embedding", k = 5, cents,
          nprobe = 12, rerank = 256)
        .select(col("id").as("vec_id"), round(col("sim"), 6).as("sim_r"))
    },

    "v11_knn_sq8" -> withOracle(
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |), m AS (
        |  SELECT vec_id, ev,
        |         list_max(list_transform(ev, x -> abs(x))) AS mx
        |  FROM v
        |), c AS (
        |  SELECT vec_id,
        |         CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS s,
        |         list_transform(ev, x ->
        |           CAST(floor(x * (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END) + 0.5) AS BIGINT)) AS cv
        |  FROM m
        |), q AS (
        |  SELECT s AS qs, cv AS qcv FROM c WHERE vec_id = 0
        |), scored AS (
        |  SELECT d.vec_id,
        |         CAST(list_sum(list_transform(range(1, len(d.cv) + 1),
        |           i -> d.cv[i] * q.qcv[i])) AS BIGINT) AS dotq,
        |         d.s, q.qs
        |  FROM c d, q WHERE d.vec_id <> 0
        |)
        |SELECT vec_id, dotq,
        |       ROUND(CASE WHEN s > 0 AND qs > 0
        |                  THEN CAST(dotq AS DOUBLE) / (s * qs) ELSE 0.0 END, 6) AS score_r
        |FROM scored
        |ORDER BY CASE WHEN s > 0 AND qs > 0
        |              THEN CAST(dotq AS DOUBLE) / (s * qs) ELSE 0.0 END DESC, vec_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      VectorFunctions.knnSq8(
          e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          e.filter(col("vec_id") === 0), "embedding", k = 10)
        .select(col("id").as("vec_id"), col("dotq"),
          round(col("score"), 6).as("score_r"))
    },

    // V13 — BINARY (sign-bit) QUANTIZED kNN: 32× compression, Hamming
    // popcount pre-rank, exact cosine rerank of the top 100. The sign
    // of each element is an exact per-element predicate (no summation),
    // so the oracle replays the candidate set bit-exactly; cosine
    // rounds at 6 like v1.
    "v13_knn_binary" -> withOracle(
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |), q AS (
        |  SELECT ev AS qv FROM v WHERE vec_id = 0
        |), h AS (
        |  SELECT d.vec_id, d.ev,
        |         CAST(list_sum(list_transform(range(1, len(d.ev) + 1),
        |           i -> CASE WHEN (d.ev[i] >= 0) <> (q.qv[i] >= 0)
        |                     THEN 1 ELSE 0 END)) AS BIGINT) AS ham
        |  FROM v d, q WHERE d.vec_id <> 0
        |), cand AS (
        |  SELECT vec_id, ev, ham FROM h ORDER BY ham, vec_id LIMIT 100
        |), scored AS (
        |  SELECT c.vec_id, c.ham, list_cosine_similarity(c.ev, q.qv) AS sim
        |  FROM cand c, q
        |)
        |SELECT vec_id, ham, ROUND(sim, 6) AS sim_r
        |FROM scored
        |ORDER BY sim DESC, vec_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      VectorFunctions.knnBinary(
          e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          e.filter(col("vec_id") === 0), "embedding", k = 10, rerank = 100)
        .select(col("id").as("vec_id"), col("ham"),
          round(col("sim"), 6).as("sim_r"))
    },

    // V14 — CLUSTER-BALANCED SAMPLING: equal per-cluster quota (20)
    // from each of v9's 16 fixed semantic clusters, drawn by the Knuth
    // hash order — the topic-balancing curation step, fully
    // deterministic. Oracle: v9's assignment CTE + the t39 ranked
    // window under the identical (h, vec_id) total order.
    "v14_balanced_sample" -> withOracle(
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |), c AS (
        |  SELECT vec_id AS cid, ev AS cv FROM v WHERE vec_id < 16
        |), assign AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT v.vec_id, c.cid AS cluster,
        |           ROW_NUMBER() OVER (PARTITION BY v.vec_id
        |             ORDER BY list_cosine_similarity(v.ev, c.cv) DESC, c.cid) AS rn
        |    FROM v, c) WHERE rn = 1
        |), h AS (
        |  SELECT vec_id, cluster, (vec_id * 2654435761) % 1000000007 AS h
        |  FROM assign
        |), r AS (
        |  SELECT vec_id, cluster, h,
        |         ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY h, vec_id) AS rn
        |  FROM h
        |)
        |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, CAST(h AS BIGINT) AS h
        |FROM r WHERE rn <= 20
        |ORDER BY cluster, h, vec_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val rows = e.filter(col("vec_id") < 16).orderBy("vec_id")
        .select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      val m = graft.functions.CentroidMatrix.normalized(rows)
      VectorFunctions.balancedSample(e, "vec_id", "embedding", m, perCluster = 20)
        .select(col("id").as("vec_id"), col("cluster"), col("h"))
        .orderBy("cluster", "h", "vec_id")
    },

    // V15 — radius (range) search: ALL vectors with cosine >= tau of
    // each query, not a fixed top-k (faiss range_search). One broadcast
    // of the query set against one map-only scan — no shuffle; the
    // boundary sits >= 5e-4 from every data sim at both gate SFs, far
    // beyond any float-vs-double accumulation drift (the v2/v3
    // sign-boundary assumption, applied to a magnitude threshold).
    "v15_range_search" -> withOracle(
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id AS qid, ev AS qv FROM v WHERE vec_id < 5
        |)
        |SELECT q.qid, v.vec_id, ROUND(list_cosine_similarity(v.ev, q.qv), 6) AS sim_r
        |FROM v, q
        |WHERE v.vec_id <> q.qid
        |  AND list_cosine_similarity(v.ev, q.qv) >= 0.3
        |ORDER BY qid, vec_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      VectorFunctions.rangeSearch(e, "vec_id", "embedding",
          e.filter(col("vec_id") < 5), "vec_id", "embedding", tau = 0.3)
        .filter(col("id") =!= col("qid"))
        .select(col("qid"), col("id").as("vec_id"), round(col("sim"), 6).as("sim_r"))
        .orderBy("qid", "vec_id")
    }
  )
}
