package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup
import graft.functions.RollingHash.rolling_hash
import graft.functions.BpeExpressions.bpe_token_count
import graft.text.{Bpe, CorpusScoring, MixtureSampling, TextFunctions}

/** Training-data text pipeline: deduplication (exact, n-gram Jaccard,
  * MinHash+LSH, SimHash), language-ID, quality scoring, token counting,
  * fingerprinting — each over the `documents` table with a DuckDB oracle
  * where SQL can express the same computation.
  */
object TextQueries {

  import QueryDef._

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // one inverted index per sf dir, built once per JVM (t26)
  private val searchIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // one persisted LSH near-dup index per sf dir (d9)
  private val lshIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // Shared DuckDB fragment: distinct word-bigram shingles per doc.
  private val duckShingles =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingle
      |  FROM toks WHERE len(ws) >= 2
      |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT id_a, id_b
      |FROM inter JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
      |WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** d4's oracle, generated: the 64 per-bit vote sums as one GROUP BY
    * pass (64 aggregate expressions over the token-hash rows) instead of
    * a base x range(64) row expansion — O(tokens) rows, which is what
    * lets the x10 sweep hash-check it instead of gating at x3. Literals
    * are precomputed per bit; segments are 16-bit ints, hamming is
    * xor+bit_count per segment. Verified row-identical to the expanded
    * form at sf0.01 and sf0.1.
    */
  private lazy val d4OracleSql: String = {
    val votes = (0 until 64).map { i =>
      val mul = 1013904223L + 2L * i
      val add = i.toLong * 2654435761L
      s"SUM(CASE WHEN ((h * $mul + $add) % 2147483647 // 4096) % 2 = 1 THEN 1 ELSE -1 END) AS s$i"
    }.mkString(",\n         ")
    val fps = (0 until 4).map { k =>
      (0 until 16).map(j => s"(CASE WHEN s${k * 16 + j} > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ") + s" AS v$k"
    }.mkString(",\n       ")
    val hd = (0 until 4)
      .map(k => s"bit_count(xor(CAST(fa.v$k AS BIGINT), CAST(fb.v$k AS BIGINT)))")
      .mkString(" + ")
    val segsUnion = (0 until 4)
      .map(k => s"SELECT doc_id, $k AS seg, v$k AS v FROM fp")
      .mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS w
       |  FROM documents
       |), base AS (
       |  SELECT doc_id,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(string_split_regex(w, ''), c -> CAST(unicode(c) AS BIGINT))),
       |           (acc, x) -> (acc * 31 + x) % 1000000007) AS h
       |  FROM toks
       |), votes AS (
       |  SELECT doc_id,
       |         $votes
       |  FROM base GROUP BY doc_id
       |), fp AS (
       |  SELECT doc_id,
       |       $fps
       |  FROM votes
       |), segs AS (
       |  $segsUnion
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM segs a JOIN segs b ON a.seg = b.seg AND a.v = b.v AND a.doc_id < b.doc_id
       |), ham AS (
       |  SELECT c.id_a, c.id_b, $hd AS hd
       |  FROM cand c JOIN fp fa ON fa.doc_id = c.id_a JOIN fp fb ON fb.doc_id = c.id_b
       |)
       |SELECT id_a, id_b, CAST(hd AS INT) AS hamming
       |FROM ham WHERE hd <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(

    // D1 — exact dedup: smallest doc_id per distinct text (hash-grouped).
    "d1_dedup_exact" -> withOracle(
      """SELECT MIN(doc_id) AS doc_id, text
        |FROM documents
        |GROUP BY text
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // D2 — exact n-gram (word bigram) Jaccard near-dup pairs.
    "d2_ngram_jaccard" -> withOracle(duckShingles) { (s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", n = 2, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    },

    // D3 — MinHash+LSH near-dup pairs, verified by exact Jaccard: with
    // 128 hashes in 64 bands recall at j>=0.5 is 1-1e-8, so the exact
    // pair set is the oracle.
    "d3_minhash_lsh" -> withOracle(duckShingles) { (s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text", n = 2, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    },

    // D5 — cluster-level dedup: near-dup pairs (LSH recall ~1, so the
    // exact-Jaccard pair set is the edge list) → connected components →
    // keep the smallest doc_id per cluster. The oracle replays the
    // closure with a recursive CTE: a doc survives iff the minimum id
    // reachable from it is itself.
    "d5_neardup_dedup" -> withOracle(
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingle
        |  FROM toks WHERE len(ws) >= 2
        |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b
        |  FROM inter JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
        |  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), reach(id, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.id
        |)
        |SELECT id AS doc_id FROM reach
        |GROUP BY id HAVING MIN(lab) = id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.neardupDedup(t(s, dir, "documents"), "doc_id", "text", n = 2, threshold = 0.5)
        .select("doc_id")
        .orderBy("doc_id")
    },

    // D8 — cluster dedup keeping the BEST representative (argmax
    // n_chars, min-id tiebreak — the FineWeb keep-the-longest rule)
    // instead of d5's min id: survivor election is one
    // max(struct(quality, -id)) hash aggregation, never a per-cluster
    // sort. Oracle: d5's recursive-CTE components + a ranked window.
    "d8_neardup_best" -> withOracle(
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingle
        |  FROM toks WHERE len(ws) >= 2
        |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b
        |  FROM inter JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
        |  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), reach(id, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.id
        |), grp AS (SELECT id, MIN(lab) AS comp FROM reach GROUP BY id),
        |win AS (
        |  SELECT d.doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY grp.comp
        |                            ORDER BY d.n_chars DESC, d.doc_id) AS rn
        |  FROM grp JOIN documents d ON d.doc_id = grp.id
        |)
        |SELECT doc_id FROM win WHERE rn = 1
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.neardupDedupBest(t(s, dir, "documents"), "doc_id", "text",
          n = 2, threshold = 0.5, quality = col("n_chars").cast("double"))
        .select("doc_id")
        .orderBy("doc_id")
    },

    // D4 — SimHash near-dup pairs. The token hash family is a rolling
    // hash (mod 1e9+7) expanded to 64 bits by an affine map mod 2^31-1 —
    // plain integer arithmetic (HashOps.simhash scaladoc), so the oracle
    // replays the exact fingerprints. LINEAR form (VERDICT r14 #4): one
    // 64-aggregate pass computes each doc's fingerprint as four 16-bit
    // segment values (instead of exploding base x range(64) rows),
    // candidates come from the same 16-bit pigeonhole segment buckets,
    // and hamming is xor+bit_count over the four segments — verified
    // row-identical to the row-expanded formulation at sf0.01/sf0.1.
    "d4_simhash" -> withOracle(d4OracleSql) { (s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")
    },

    // T1 — token counting: whitespace tokens + BPE-ish regex tokens.
    "t1_token_stats" -> withOracle(
      """SELECT doc_id,
        |       CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]')) AS BIGINT) AS n_bpe_tokens,
        |       CAST(LENGTH(text) AS BIGINT) AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_ws_tokens"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_bpe_tokens"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    },

    // T2 — language-ID heuristic (stopword-hit argmax, fixed tie order).
    "t2_lang_id" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id, list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS ws
        |  FROM documents
        |), s AS (
        |  SELECT doc_id,
        |    len(list_intersect(ws, ['the','a','of','and','to','in','is','it','that','for'])) AS en,
        |    len(list_intersect(ws, ['der','die','das','und','ist','ein','eine','zu','mit','von'])) AS de,
        |    len(list_intersect(ws, ['el','la','de','que','y','en','un','una','es','por'])) AS es,
        |    len(list_intersect(ws, ['le','la','de','et','un','une','est','que','pour','dans'])) AS fr
        |  FROM d
        |)
        |SELECT doc_id,
        |       CASE WHEN en = 0 AND de = 0 AND es = 0 AND fr = 0 THEN 'und'
        |            WHEN en >= de AND en >= es AND en >= fr THEN 'en'
        |            WHEN de >= es AND de >= fr THEN 'de'
        |            WHEN es >= fr THEN 'es'
        |            ELSE 'fr' END AS lang_pred
        |FROM s
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    },

    // T3 — quality metrics (deterministic integer-derived doubles).
    "t3_quality" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents
        |)
        |SELECT doc_id,
        |       CAST(len(ws) AS BIGINT) AS n_tokens,
        |       len(list_distinct(ws)) * 1.0 / len(ws) AS type_token_ratio,
        |       list_sum(list_transform(ws, w -> length(w))) * 1.0 / len(ws) AS mean_token_len,
        |       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text) AS alpha_ratio
        |FROM d
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val m = TextFunctions.qualityMetrics(col("text")).toMap
      t(s, dir, "documents")
        .select(col("doc_id"),
          m("n_tokens").as("n_tokens"),
          m("type_token_ratio").as("type_token_ratio"),
          m("mean_token_len").as("mean_token_len"),
          m("alpha_ratio").as("alpha_ratio"))
        .orderBy("doc_id")
    },

    // T4 — document fingerprint: native codegen rolling-hash Expression,
    // byte-for-byte reproduced by a DuckDB fold over character codes
    // (ASCII corpus; both sides mod 1e9+7).
    // T5 — the composed training-data curation pipeline the individual
    // operators exist for: language gate -> cheap quality gate -> exact
    // dedup -> corpus stats per language. One dataflow, each stage a
    // library operator; the oracle recomputes the same pipeline in SQL.
    "t5_curation_pipeline" -> withOracle(
      """WITH scored AS (
        |  SELECT doc_id, text,
        |         CASE WHEN len(list_intersect(
        |                list_distinct(list_filter(string_split(text,' '), x -> x <> '')),
        |                ['the','a','of','and','to','in','is','it','that','for'])) > 0
        |                OR len(list_intersect(
        |                list_distinct(list_filter(string_split(text,' '), x -> x <> '')),
        |                ['der','die','das','und','ist','ein','eine','zu','mit','von'])) > 0
        |           THEN 1 ELSE 0 END AS keep_lang,
        |         len(list_filter(string_split(text,' '), x -> x <> '')) AS n_tokens
        |  FROM documents
        |), gated AS (
        |  SELECT doc_id, text FROM scored WHERE keep_lang = 1 AND n_tokens >= 10
        |), deduped AS (
        |  SELECT MIN(doc_id) AS doc_id, text FROM gated GROUP BY text
        |)
        |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS docs,
        |       CAST(SUM(LENGTH(dd.text)) AS BIGINT) AS chars
        |FROM deduped dd JOIN documents d USING (doc_id)
        |GROUP BY d.lang
        |ORDER BY d.lang""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val gated = docs
        .filter(TextFunctions.stopwordHits(col("text"), "en") > 0 ||
          TextFunctions.stopwordHits(col("text"), "de") > 0)
        .filter(size(TextFunctions.tokens(col("text"))) >= 10)
      val deduped = Dedup.exact(gated, "doc_id", "text")
      deduped
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"), sum(length(col("text"))).as("chars"))
        .orderBy("lang")
    },

    // T6 — deterministic hash-based train/held-out split with per-split
    // token budgets: assignment is a pure function of the document
    // fingerprint (stable across runs/partitions, no RNG), replayed
    // exactly by the oracle.
    "t6_split" -> withOracle(
      """WITH fp AS (
        |  SELECT doc_id,
        |         list_reduce(
        |           list_prepend(CAST(0 AS BIGINT),
        |             list_transform(string_split_regex(text, ''), c -> CAST(unicode(c) AS BIGINT))),
        |           (acc, x) -> (acc * 31 + x) % 1000000007) AS h,
        |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS ntok
        |  FROM documents
        |)
        |SELECT CASE WHEN h % 100 < 90 THEN 'train' ELSE 'heldout' END AS split,
        |       CAST(COUNT(*) AS BIGINT) AS docs,
        |       CAST(SUM(ntok) AS BIGINT) AS tokens
        |FROM fp
        |GROUP BY 1
        |ORDER BY split""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(TextFunctions.hashSplit(col("text"), 90).as("split"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("ntok"))
        .groupBy("split")
        .agg(count(lit(1)).as("docs"), sum(col("ntok")).as("tokens"))
        .orderBy("split")
    },

    // T8 — repetition quality signals (Gopher §A.1.1 shape): repeated-
    // word fraction plus the share of bigram/trigram occurrences held by
    // the single most frequent n-gram. The n-gram stats are a native
    // one-pass codegen expression (no explode, no shuffle — the signal
    // prices like a scalar projection at any corpus size); the oracle
    // recomputes them the expensive way (unnest + GROUP BY).
    "t8_repetition" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents
        |), g2 AS (
        |  SELECT doc_id, g, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS g
        |    FROM d WHERE len(ws) >= 2) GROUP BY 1, 2
        |), g3 AS (
        |  SELECT doc_id, g, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        |    FROM d WHERE len(ws) >= 3) GROUP BY 1, 2
        |), t2 AS (SELECT doc_id, MAX(c) * 1.0 / SUM(c) AS f FROM g2 GROUP BY 1),
        |   t3 AS (SELECT doc_id, MAX(c) * 1.0 / SUM(c) AS f FROM g3 GROUP BY 1)
        |SELECT d.doc_id,
        |       1.0 - len(list_distinct(ws)) * 1.0 / len(ws) AS dup_word_frac,
        |       t2.f AS top_bigram_frac,
        |       t3.f AS top_trigram_frac
        |FROM d LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.dupWordFraction(col("text")).as("dup_word_frac"),
          TextFunctions.topNgramFraction(col("text"), 2).as("top_bigram_frac"),
          TextFunctions.topNgramFraction(col("text"), 3).as("top_trigram_frac"))
        .orderBy("doc_id")
    },

    // T9 — benchmark decontamination audit: documents sharing any word
    // 4-gram with the held-out benchmark set (source 'src0'), with the
    // count of distinct shared 4-grams. An anti-join of these ids yields
    // the decontaminated corpus. Scale shape: the benchmark n-gram set is
    // the small side and broadcasts, so the corpus side never shuffles
    // for candidate generation.
    "t9_decontaminate" -> withOracle(
      """WITH w AS (
        |  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents
        |), g AS (
        |  SELECT DISTINCT doc_id, source,
        |         unnest(list_transform(range(1, len(ws) - 2),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS g
        |  FROM w WHERE len(ws) >= 4
        |), b AS (SELECT DISTINCT g FROM g WHERE source = 'src0')
        |SELECT m.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM g m JOIN b USING (g)
        |WHERE m.source <> 'src0'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("source") === "src0")
        .select(explode(TextFunctions.shingleSet(col("text"), 4)).as("g")).distinct()
      docs.filter(col("source") =!= "src0")
        .select(col("doc_id"), explode(TextFunctions.shingleSet(col("text"), 4)).as("g"))
        .join(broadcast(bench), "g")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    },

    // T20 — FUZZY decontamination: train docs whose bigram Jaccard
    // against ANY src0 (benchmark) doc reaches 0.5, via cross
    // MinHash-LSH banding (benchmark side broadcast) + exact-Jaccard
    // verify. Complements t9's exact 4-gram overlap: paraphrased eval
    // leakage defeats exact n-grams, not Jaccard. At the d3 LSH regime
    // (64 bands × 2 rows) recall at j ≥ 0.5 is 1−1e-8, so the oracle is
    // the exact cross-pair set.
    "t20_fuzzy_decontaminate" -> withOracle(
      """WITH toks AS (
        |  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, source,
        |         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingle
        |  FROM toks WHERE len(ws) >= 2
        |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |bsh AS (SELECT doc_id, shingle FROM sh WHERE source = 'src0'),
        |msh AS (SELECT doc_id, shingle FROM sh WHERE source <> 'src0'),
        |inter AS (
        |  SELECT m.doc_id AS did, b.doc_id AS bid, count(*) AS i
        |  FROM msh m JOIN bsh b USING (shingle) GROUP BY 1, 2
        |)
        |SELECT did AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
        |FROM inter JOIN sz sa ON did = sa.doc_id JOIN sz sb ON bid = sb.doc_id
        |WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup.crossContamination(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 2, threshold = 0.5)
        .select(col("id").as("doc_id"), col("n_matches"))
        .orderBy("doc_id")
    },

    // T10 — PII redaction: emails and phone-shaped digit groups replaced
    // by typed placeholders, with audit counts. The corpus carries no
    // PII, so the query plants deterministic PII on every 5th doc first
    // (both engines build the identical augmented text); the operator
    // under test is the redaction chain, which runs fully inside
    // whole-stage codegen.
    "t10_pii_redact" -> withOracle(
      """WITH aug AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0
        |              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
        |                   || '@example.com or 555-0' || CAST(100 + doc_id % 900 AS VARCHAR)
        |              ELSE text END AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |       regexp_replace(regexp_replace(t,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |         '\d{3}-\d{4}', '<PHONE>', 'g') AS redacted,
        |       CAST(len(regexp_extract_all(t,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |       CAST(len(regexp_extract_all(regexp_replace(t,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |         '\d{3}-\d{4}')) AS BIGINT) AS n_phones
        |FROM aug
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val aug = when(pmod(col("doc_id"), lit(5)) === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 555-0"),
          (lit(100) + pmod(col("doc_id"), lit(900))).cast("string")))
        .otherwise(col("text"))
      val counts = TextFunctions.piiCounts(aug).toMap
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.redactPii(aug).as("redacted"),
          counts("n_emails").as("n_emails"),
          counts("n_phones").as("n_phones"))
        .orderBy("doc_id")
    },

    // T18 — sub-document (paragraph/unit) exact dedup, the
    // RefinedWeb/FineWeb stage document-level dedup cannot replace:
    // boilerplate units repeating across otherwise-distinct documents.
    // Units are fixed 8-word chunks (this corpus has no paragraph
    // separators); the globally FIRST occurrence (min doc·position) of
    // each unit survives and documents reassemble from surviving units
    // in order. The Spark side shuffles only (unit-hash, encoded
    // doc·position) — unit text never rides a shuffle; the oracle
    // replays the identical chunking, election, and reassembly over the
    // unit TEXT (they diverge only on a 64-bit hash collision, absent
    // here and negligible by design).
    "t18_paragraph_dedup" -> withOracle(
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents
        |), idx AS (
        |  SELECT doc_id, unnest(range(CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS pos FROM w
        |), u AS (
        |  SELECT i.doc_id, i.pos,
        |         array_to_string(list_slice(w.ws, CAST(i.pos*8+1 AS BIGINT), CAST(i.pos*8+8 AS BIGINT)), ' ') AS unit
        |  FROM idx i JOIN w USING (doc_id)
        |), k AS (
        |  SELECT unit, MIN(doc_id * 1000000 + pos) AS keep FROM u GROUP BY unit
        |), kept AS (
        |  SELECT u.doc_id, u.pos, u.unit
        |  FROM u JOIN k ON u.unit = k.unit AND u.doc_id * 1000000 + u.pos = k.keep
        |), re AS (
        |  SELECT doc_id, string_agg(unit, ' ' ORDER BY pos) AS text_dedup,
        |         COUNT(*) AS units_kept
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT w.doc_id AS id,
        |       COALESCE(re.text_dedup, '') AS text_dedup,
        |       CAST(ceil(len(w.ws) / 8.0) AS BIGINT) AS units_total,
        |       CAST(COALESCE(re.units_kept, 0) AS BIGINT) AS units_kept
        |FROM w LEFT JOIN re USING (doc_id)
        |ORDER BY id""".stripMargin) { (s, dir) =>
      Dedup.paragraphDedup(t(s, dir, "documents"), "doc_id", "text", unitWords = 8)
        .orderBy("id")
    },

    // T17 — token-BUDGET mixture sampling: each source cut to a target
    // token count in deterministic hash order (the "blend sources to a
    // mixture" recipe). The oracle is the naive per-domain running-sum
    // window; the engine's two-phase bucket-histogram plan must match it
    // doc-for-doc while never sorting a whole domain in one reducer.
    "t17_mixture" -> withOracle(
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS ntok,
        |         (doc_id * 2654435761) % 1000000007 AS h,
        |         CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 800
        |              WHEN source IN ('src5','src6','src7','src8','src9') THEN 400
        |              ELSE 200 END AS budget
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, ntok, budget,
        |         SUM(ntok) OVER (PARTITION BY source ORDER BY h, doc_id
        |                         ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t
        |)
        |SELECT doc_id, source, ntok AS tokens FROM c WHERE cum <= budget
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val budgets = ((0 to 4).map("src" + _ -> 800L) ++
        (5 to 9).map("src" + _ -> 400L) ++
        (10 to 19).map("src" + _ -> 200L)).toMap
      MixtureSampling.sampleToBudget(t(s, dir, "documents"), "doc_id", "source",
        size(TextFunctions.tokens(col("text"))), budgets)
        .orderBy("doc_id")
    },

    // T11 — domain mixing: deterministic per-source sampling rates
    // (80/50/20) through the hash gate, then the blended corpus counts.
    // No RNG and no sampling state — the blend is a pure function of
    // (source, text), reproducible on any cluster at any partitioning,
    // and the oracle replays it exactly in SQL.
    "t11_domain_mix" -> withOracle(
      """WITH fp AS (
        |  SELECT source,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(string_split_regex(text, ''), c -> CAST(unicode(c) AS BIGINT))),
        |           (acc, x) -> (acc * 31 + x) % 1000000007) AS h,
        |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS ntok,
        |         CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 80
        |              WHEN source IN ('src5','src6','src7','src8','src9') THEN 50
        |              ELSE 20 END AS rate
        |  FROM documents
        |)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS docs, CAST(SUM(ntok) AS BIGINT) AS tokens
        |FROM fp WHERE h % 100 < rate
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, dir) =>
      val rate = when(col("source").isin((0 to 4).map("src" + _): _*), lit(80))
        .when(col("source").isin((5 to 9).map("src" + _): _*), lit(50))
        .otherwise(lit(20))
      t(s, dir, "documents")
        .filter(TextFunctions.sampleByRate(col("text"), rate))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
          sum(size(TextFunctions.tokens(col("text")))).cast("long").as("tokens"))
        .orderBy("source")
    },

    // D6 — incremental dedup against a reference corpus via a Bloom
    // filter built on the reference texts: probe-misses pass through
    // with zero join work (no false negatives), probe-hits are exactly
    // confirmed. The oracle is the plain NOT EXISTS the bloom path must
    // reproduce bit-for-bit.
    "d6_bloom_dedup" -> withOracle(
      """SELECT m.doc_id
        |FROM documents m
        |WHERE m.doc_id % 2 = 1
        |  AND NOT EXISTS (SELECT 1 FROM documents r
        |                  WHERE r.doc_id % 2 = 0 AND r.text = m.text)
        |ORDER BY m.doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val ref = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val main = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      Dedup.bloomDedup(main, ref, "text")
        .select("doc_id")
        .orderBy("doc_id")
    },

    // D7 — PARTITIONED bloom dedup: the d6 shape for reference corpora
    // whose single filter outgrows a broadcast — per-bucket filters
    // (mergeable bloom_agg), probes co-shuffled to their bucket's
    // filter via SHUFFLE_HASH, same exact confirm join. The oracle is
    // the identical NOT EXISTS; results must match d6 bit-for-bit.
    "d7_bloom_partitioned" -> withOracle(
      """SELECT m.doc_id
        |FROM documents m
        |WHERE m.doc_id % 2 = 1
        |  AND NOT EXISTS (SELECT 1 FROM documents r
        |                  WHERE r.doc_id % 2 = 0 AND r.text = m.text)
        |ORDER BY m.doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val ref = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val main = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      Dedup.bloomDedupPartitioned(main, ref, "text", buckets = 16)
        .select("doc_id")
        .orderBy("doc_id")
    },

    // T12 — TF-IDF top-3 terms per document (smoothed idf, rounded to 6
    // decimals BEFORE ranking so both engines rank identically; ties
    // break by term). The df table is the small side and broadcasts.
    "t12_tfidf" -> withOracle(
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
        |), n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toks),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |         ROUND(tf * (ln((n.n + 1.0) / (df + 1.0)) + 1.0), 6) AS score
        |  FROM tf JOIN dfreq USING (term), n
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
        |  FROM scored
        |)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |       score, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin) { (s, dir) =>
      CorpusScoring.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")
    },

    // T13 — sequence packing: documents binned into 256-token training
    // sequences by greedy contiguous packing in id order, priced in BPE
    // tokens (the pinned corpus merge table — what a training pipeline
    // actually budgets), not whitespace words. The Spark side computes
    // the global running sum as a distributed two-phase prefix scan
    // (parallel per-partition windows + broadcast offsets — never a
    // single-partition global window); the oracle replays BPE encoding
    // with a recursive CTE, then applies the plain global window the
    // scan must equal exactly.
    "t13_pack" -> withOracle(
      s"""WITH RECURSIVE
        |${Bpe.oracleCtes},
        |c AS (
        |  SELECT doc_id, bpe_tokens AS ntok,
        |         SUM(bpe_tokens) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bpe_tokens AS tok_before
        |  FROM bpe_doc
        |)
        |SELECT CAST(tok_before // 256 AS BIGINT) AS bin,
        |       CAST(COUNT(*) AS BIGINT) AS docs,
        |       CAST(SUM(ntok) AS BIGINT) AS tokens
        |FROM c
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.text.SequencePacking.packSummary(
          t(s, dir, "documents").filter(col("text").isNotNull), "doc_id", "text",
          budgetTokens = 256,
          tokenCount = c => bpe_token_count(c, Bpe.corpusMerges))
        .orderBy("bin")
    },

    // T14 — BPE token statistics per document: real (merge-table) token
    // counts next to whitespace counts, the budgeting signal training
    // pipelines actually use. The merge table is pinned
    // (graft.text.Bpe.corpusMerges, trained by the distributed trainer
    // over this corpus — BpeSpec proves the round trip) and the oracle
    // re-derives every count from the same table via a recursive CTE,
    // so the entire encoder — not just the sums — is cross-checked.
    "t14_bpe_stats" -> withOracle(
      s"""WITH RECURSIVE
        |${Bpe.oracleCtes}
        |SELECT doc_id, bpe_tokens, ws_tokens
        |FROM bpe_doc
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"),
          bpe_token_count(col("text"), Bpe.corpusMerges).cast("long").as("bpe_tokens"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("ws_tokens"))
        .orderBy("doc_id")
    },

    // T16 — duplicated-span detection (exact-substring-dedup signal):
    // word 4-grams appearing in >= 2 documents flag boilerplate; each
    // doc reports its span count, shared-span count, and fraction. The
    // per-doc span set is DISTINCT (word_shingle_set), so a span's
    // occurrence count in the exploded relation is its document
    // frequency on both engines.
    "t16_dup_spans" -> withOracle(
      """WITH words AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE text IS NOT NULL
        |),
        |spans AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(ws) - 2),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS s
        |  FROM words WHERE len(ws) >= 4
        |),
        |c AS (SELECT s, COUNT(*) AS d FROM spans GROUP BY 1)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_spans,
        |       CAST(SUM(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
        |       ROUND(SUM(CASE WHEN d >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS dup_frac
        |FROM spans JOIN c USING (s)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      CorpusScoring.duplicateSpans(t(s, dir, "documents"), "doc_id", "text", k = 4)
        .orderBy("doc_id")
    },

    // T15 — bigram LM scoring (the CCNet-shape perplexity filter): an
    // add-0.5-smoothed bigram model trained on the corpus itself scores
    // every document by mean bigram log-probability. The oracle rebuilds
    // the identical model and scores in SQL; means round to 6 dp before
    // compare so summation order cannot split the engines.
    "t15_lm_score" -> withOracle(
      """WITH words AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE text IS NOT NULL
        |),
        |bi AS (
        |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b, ws[i] AS w1
        |  FROM words, unnest(range(1, len(ws))) AS t(i)
        |  WHERE len(ws) >= 2
        |),
        |bc AS (SELECT b, COUNT(*) AS c FROM bi GROUP BY 1),
        |cc AS (SELECT w1, COUNT(*) AS n FROM bi GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT w) AS v FROM (
        |  SELECT string_split(b, ' ')[1] AS w FROM bc
        |  UNION SELECT string_split(b, ' ')[2] AS w FROM bc))
        |SELECT bi.doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       ROUND(AVG(ln((bc.c + 0.5) / (cc.n + 0.5 * v.v))), 6) AS lm_score
        |FROM bi JOIN bc USING (b) JOIN cc USING (w1), v
        |GROUP BY bi.doc_id
        |ORDER BY bi.doc_id""".stripMargin) { (s, dir) =>
      CorpusScoring.lmBigramScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // T24 — exact substring-dedup REMOVAL (Lee et al. '22 excision):
    // every k-gram span occurrence that recurs after its global first
    // occurrence has its words excised; docs reassemble from survivors.
    // t16 scores the duplication; this emits the scrubbed corpus.
    "t24_substring_scrub" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents
        |), occ AS (
        |  SELECT doc_id, i - 1 AS pos,
        |         array_to_string(list_slice(ws, i, i + 3), ' ') AS g
        |  FROM d, unnest(range(1, len(ws) - 2)) AS t(i)
        |  WHERE len(ws) >= 4
        |), firsts AS (
        |  SELECT g, MIN(doc_id * 1000000 + pos) AS first_k FROM occ GROUP BY 1
        |), dup AS (
        |  SELECT o.doc_id, o.pos FROM occ o JOIN firsts f ON o.g = f.g
        |  WHERE o.doc_id * 1000000 + o.pos <> f.first_k
        |), covered AS (
        |  SELECT DISTINCT doc_id, pos + j AS i FROM dup, unnest(range(0, 4)) AS t(j)
        |), wordpos AS (
        |  SELECT doc_id, i - 1 AS i, ws[i] AS w
        |  FROM d, unnest(range(1, len(ws) + 1)) AS t(i)
        |), kept AS (
        |  SELECT wp.doc_id, wp.i, wp.w FROM wordpos wp
        |  ANTI JOIN covered c ON wp.doc_id = c.doc_id AND wp.i = c.i
        |), re AS (
        |  SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS txt, COUNT(*) AS cnt
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT d.doc_id AS id,
        |       COALESCE(re.txt, '') AS text_scrubbed,
        |       CAST(COALESCE(len(d.ws), 0) AS BIGINT) AS n_words,
        |       CAST(COALESCE(len(d.ws), 0) - COALESCE(re.cnt, 0) AS BIGINT) AS n_removed
        |FROM d LEFT JOIN re USING (doc_id)
        |ORDER BY id""".stripMargin) { (s, dir) =>
      Dedup.removeDuplicateSpans(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("id")
    },

    // T21 — CCNet-shape perplexity bucketing: NTILE tiers over the t15
    // LM score. The oracle's NTILE() OVER (ORDER BY ...) is the
    // single-reducer translation DuckDB can afford at sf0.01; the Spark
    // side is the distributed two-phase rank (GlobalRank.withNtile).
    "t21_lm_buckets" -> withOracle(
      """WITH words AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE text IS NOT NULL
        |),
        |bi AS (
        |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b, ws[i] AS w1
        |  FROM words, unnest(range(1, len(ws))) AS t(i)
        |  WHERE len(ws) >= 2
        |),
        |bc AS (SELECT b, COUNT(*) AS c FROM bi GROUP BY 1),
        |cc AS (SELECT w1, COUNT(*) AS n FROM bi GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT w) AS v FROM (
        |  SELECT string_split(b, ' ')[1] AS w FROM bc
        |  UNION SELECT string_split(b, ' ')[2] AS w FROM bc)),
        |scored AS (
        |  SELECT bi.doc_id,
        |         ROUND(AVG(ln((bc.c + 0.5) / (cc.n + 0.5 * v.v))), 6) AS lm_score
        |  FROM bi JOIN bc USING (b) JOIN cc USING (w1), v
        |  GROUP BY bi.doc_id
        |)
        |SELECT doc_id, lm_score,
        |       CAST(NTILE(3) OVER (ORDER BY lm_score, doc_id) AS BIGINT) AS bucket
        |FROM scored
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      CorpusScoring.perplexityBuckets(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // T25 — DSIR importance resampling (Xie et al. '23): hashed-bigram
    // bag models of a TARGET subset (lang 'en' as the weak target) vs
    // the RAW corpus; every doc scored by the feature log-likelihood
    // ratio, top-150 selected. The oracle replays the gram→bucket hash
    // (poly 31 mod 1e9+7, mod 4096 — same family d4/t3 already pin),
    // both smoothed models, the 6-dp weight, and the rank tiebreak; its
    // ROW_NUMBER() OVER (ORDER BY ...) is the single-reducer translation
    // of the distributed GlobalRank only the sf0.01 oracle can afford.
    "t25_dsir_sample" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE text IS NOT NULL
        |),
        |g AS (
        |  SELECT doc_id, y, ws[i] || ' ' || ws[i+1] AS gram
        |  FROM d, unnest(range(1, len(ws))) AS t(i)
        |  WHERE len(ws) >= 2
        |),
        |b AS (
        |  SELECT doc_id, y,
        |         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |             list_transform(string_split_regex(gram, ''),
        |                            c -> CAST(unicode(c) AS BIGINT))),
        |             (acc, x) -> (acc * 31 + x) % 1000000007) % 4096 AS INT) AS bkt
        |  FROM g
        |),
        |counts AS (SELECT bkt, SUM(y) AS ct, COUNT(*) AS cr FROM b GROUP BY 1),
        |tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM counts),
        |w AS (
        |  SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |         ROUND(SUM(ln((counts.ct + 1.0) / (tot.tt + 4096)) -
        |                   ln((counts.cr + 1.0) / (tot.tr + 4096))), 6) AS log_ratio
        |  FROM b JOIN counts USING (bkt), tot
        |  GROUP BY b.doc_id
        |)
        |SELECT doc_id, n_grams, log_ratio, rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY log_ratio DESC, doc_id) AS rank FROM w)
        |WHERE rank <= 150
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.text.ImportanceSampling
        .dsirSelect(t(s, dir, "documents"), "doc_id", "text",
          col("lang") === "en", k = 150)
        .orderBy("doc_id")
    },

    // T32 — BPE ENCODING to token ids (the artifact a training
    // pipeline ships to the model, not just the t14 count): per-word
    // cached encode under the pinned merge table, ids = codepoint for
    // single chars / 256+rank for merged tokens. The oracle replays
    // the merge recursion to the terminal token LIST per word, maps
    // ids through the shared table, and re-concatenates in document
    // order.
    "t32_bpe_encode" -> withOracle(
      s"""WITH RECURSIVE ${graft.text.Bpe.oracleCtes},
         |bpe_terminal AS (
         |  SELECT w, min_by(toks, len(toks)) AS toks FROM bpe_state GROUP BY w
         |),
         |vocab AS (SELECT a || b AS t, 256 + MIN(r) AS id FROM merges GROUP BY 1),
         |words AS (
         |  SELECT doc_id, i, ws[i] AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |        FROM documents WHERE text IS NOT NULL),
         |       unnest(range(1, len(ws) + 1)) AS t(i)
         |  WHERE ws[i] <> ''
         |),
         |wtoks AS (
         |  SELECT words.doc_id, words.i, u.j, bt.toks[u.j] AS t
         |  FROM words JOIN bpe_terminal bt ON bt.w = words.w,
         |       unnest(range(1, len(bt.toks) + 1)) AS u(j)
         |),
         |ids AS (
         |  SELECT doc_id, i, j,
         |         CASE WHEN length(wtoks.t) = 1 THEN unicode(wtoks.t)
         |              ELSE v.id END AS id
         |  FROM wtoks LEFT JOIN vocab v ON v.t = wtoks.t
         |)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |       string_agg(CAST(id AS VARCHAR), '|' ORDER BY i, j) AS ids_str
         |FROM ids GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.functions.BpeExpressions.bpe_encode_ids
      t(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), bpe_encode_ids(col("text"), Bpe.corpusMerges).as("__ids"))
        .filter(size(col("__ids")) > 0)
        .select(col("doc_id"),
          size(col("__ids")).cast("long").as("n_tokens"),
          array_join(col("__ids").cast("array<string>"), "|").as("ids_str"))
        .orderBy("doc_id")
    },

    // T31 — temperature-mix UPsampling with fractional epochs: head
    // domains get 2.5 epochs (2 full copies + a hash-gated half), mid
    // domains 1.0, tail 0.4 — the deterministic replication stage of a
    // training mix (the complement of t11's drop-only gate). The
    // oracle replays the copy count and epoch expansion exactly.
    "t31_epoch_upsample" -> withOracle(
      """WITH fp AS (
        |  SELECT doc_id,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(string_split_regex(text, ''), c -> CAST(unicode(c) AS BIGINT))),
        |           (acc, x) -> (acc * 31 + x) % 1000000007) AS h,
        |         CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 250
        |              WHEN source IN ('src5','src6','src7','src8','src9') THEN 100
        |              ELSE 40 END AS rate
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |         rate // 100 + CASE WHEN h % 100 < rate % 100 THEN 1 ELSE 0 END AS copies
        |  FROM fp
        |)
        |SELECT doc_id, CAST(i + 1 AS BIGINT) AS epoch
        |FROM (SELECT doc_id, unnest(range(copies)) AS i FROM c WHERE copies >= 1)
        |ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
      val rate = when(col("source").isin((0 to 4).map("src" + _): _*), lit(250))
        .when(col("source").isin((5 to 9).map("src" + _): _*), lit(100))
        .otherwise(lit(40))
      MixtureSampling.upsampleEpochs(t(s, dir, "documents"), "text", rate)
        .select(col("doc_id"), col("epoch"))
        .orderBy("doc_id", "epoch")
    },

    // T28 — byte-entropy quality signal (the Gopher/FineWeb gibberish
    // screen): Shannon entropy of each doc's byte histogram, bits/byte.
    // The companion deflate_ratio signal (real java.util.zip encoder)
    // is spec-verified — encoder output is not SQL-expressible.
    "t28_entropy" -> withOracle(
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '')) AS c
        |  FROM documents WHERE text IS NOT NULL AND len(text) > 0
        |), hist AS (
        |  SELECT doc_id, c, COUNT(*) AS k FROM ch WHERE c <> '' GROUP BY 1, 2
        |), n AS (SELECT doc_id, SUM(k) AS n FROM hist GROUP BY 1)
        |SELECT hist.doc_id,
        |       ROUND(-SUM((k * 1.0 / n.n) * ln(k * 1.0 / n.n)) / ln(2), 6) AS entropy
        |FROM hist JOIN n USING (doc_id)
        |GROUP BY hist.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.functions.HashExpressions.char_entropy
      t(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"), round(char_entropy(col("text")), 6).as("entropy"))
        .orderBy("doc_id")
    },

    // T27 — deterministic corpus shuffle + sharding: the training
    // data-loader prep stage. Order = multiplicative-hash of the id
    // (reproducible, no RNG), rank + contiguous NTILE shards via the
    // distributed GlobalRank (one range shuffle); the oracle's window
    // pair is the single-reducer translation only DuckDB runs.
    "t27_shuffle_shard" -> withOracle(
      """WITH r AS (
        |  SELECT doc_id,
        |         ROW_NUMBER() OVER (
        |           ORDER BY (doc_id * 2654435761) % 1000000007, doc_id) AS position
        |  FROM documents
        |)
        |SELECT doc_id, CAST(position AS BIGINT) AS position,
        |       CAST(NTILE(16) OVER (ORDER BY position) AS BIGINT) AS shard
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.text.ShuffleShard.shuffleShards(t(s, dir, "documents"), "doc_id", shards = 16)
        .select(col("doc_id"), col("position"), col("shard"))
        .orderBy("doc_id")
    },

    // T29 — hybrid lexical+dense retrieval (RRF): BM25 top-50 from the
    // t26 postings index fused with cosine top-50 from the embeddings
    // (vec_id aligns with doc_id in the synthetic corpus) as
    // RRF = Σ 1/(60+rank), final top-15. The oracle replays both
    // rankings (6-dp BM25 order, raw cosine order, doc-id tiebreaks)
    // and the fusion arithmetic exactly.
    "t29_hybrid_search" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE text IS NOT NULL
        |),
        |pop AS (SELECT doc_id, ws, len(ws) AS dl FROM d WHERE len(ws) > 0),
        |stats AS (SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM pop),
        |tf AS (
        |  SELECT doc_id, w AS t, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(ws) AS w FROM pop)
        |  WHERE w IN ('spark', 'merge', 'window')
        |  GROUP BY 1, 2
        |),
        |dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT tf.doc_id,
        |         ROUND(SUM(ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |               (tf.tf * 2.2 /
        |                (tf.tf + 1.2 * (0.25 + 0.75 * pop.dl / stats.avgdl)))), 6) AS bm25
        |  FROM tf JOIN dfq USING (t) JOIN pop USING (doc_id), stats
        |  GROUP BY tf.doc_id
        |),
        |lex AS (
        |  SELECT doc_id, r FROM (
        |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
        |    FROM scored) WHERE r <= 50
        |),
        |q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 5
        |),
        |dense0 AS (
        |  SELECT vec_id AS doc_id,
        |         list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), q.qv) AS sim
        |  FROM embeddings, q WHERE vec_id <> 5
        |),
        |den AS (
        |  SELECT doc_id, r FROM (
        |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS r
        |    FROM dense0) WHERE r <= 50
        |),
        |fused AS (
        |  SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id,
        |         ROUND(COALESCE(1.0 / (60 + lex.r), 0) +
        |               COALESCE(1.0 / (60 + den.r), 0), 6) AS rrf
        |  FROM lex FULL JOIN den ON lex.doc_id = den.doc_id
        |)
        |SELECT doc_id, rrf FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rk FROM fused)
        |WHERE rk <= 15
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val idx = searchIndexDirs.computeIfAbsent(dir, { _ =>
        val td = java.nio.file.Files.createTempDirectory("graft-searchidx").toString
        graft.text.SearchIndex.build(t(s, dir, "documents"), "doc_id", "text", td)
        td
      })
      val e = t(s, dir, "embeddings")
      graft.text.SearchIndex.hybridRrf(s, idx, Seq("spark", "merge", "window"),
          e.filter(col("vec_id") =!= 5), "vec_id", "embedding",
          e.filter(col("vec_id") === 5), "embedding", k = 15)
        .orderBy("doc_id")
    },

    // T26 — BM25 top-k served from a PERSISTED inverted index: the
    // corpus is scanned once into a postings GraftTable (row key term,
    // sort key doc_id, values tf + denormalized doc length) with an
    // O(1) corpus-stats sidecar; the query is point-lookups on the
    // query terms through the engine's sorted-parquet key path, df
    // derived from the retrieved lists, Okapi sum, TakeOrdered top-20.
    // The oracle recomputes the same BM25 directly from the raw corpus
    // — index-served scores must be bit-equal to the direct scan.
    "t26_index_search" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE text IS NOT NULL
        |),
        |pop AS (SELECT doc_id, ws, len(ws) AS dl FROM d WHERE len(ws) > 0),
        |stats AS (SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM pop),
        |tf AS (
        |  SELECT doc_id, w AS t, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(ws) AS w FROM pop)
        |  WHERE w IN ('spark', 'merge', 'window')
        |  GROUP BY 1, 2
        |),
        |dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT tf.doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_terms,
        |         ROUND(SUM(ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |               (tf.tf * 2.2 /
        |                (tf.tf + 1.2 * (0.25 + 0.75 * pop.dl / stats.avgdl)))), 6) AS bm25
        |  FROM tf JOIN dfq USING (t) JOIN pop USING (doc_id), stats
        |  GROUP BY tf.doc_id
        |)
        |SELECT doc_id, n_terms, bm25 FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk FROM scored)
        |WHERE rnk <= 20
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val idx = searchIndexDirs.computeIfAbsent(dir, { _ =>
        val td = java.nio.file.Files.createTempDirectory("graft-searchidx").toString
        graft.text.SearchIndex.build(t(s, dir, "documents"), "doc_id", "text", td)
        td
      })
      graft.text.SearchIndex
        .searchBm25(s, idx, Seq("spark", "merge", "window"), k = 20)
        .orderBy("doc_id")
    },

    // T23 — BM25 relevance to a fixed query-term set: the lexical
    // retrieval scorer for topic mining / RAG. Okapi k1=1.2, b=0.75;
    // the oracle replays the exact float expression.
    "t23_bm25" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE text IS NOT NULL
        |),
        |pop AS (SELECT doc_id, ws, len(ws) AS dl FROM d WHERE len(ws) > 0),
        |stats AS (SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM pop),
        |tf AS (
        |  SELECT doc_id, w AS t, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(ws) AS w FROM pop)
        |  WHERE w IN ('spark', 'merge', 'window')
        |  GROUP BY 1, 2
        |),
        |dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1)
        |SELECT tf.doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_terms,
        |       ROUND(SUM(ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |             (tf.tf * 2.2 /
        |              (tf.tf + 1.2 * (0.25 + 0.75 * pop.dl / stats.avgdl)))), 6) AS bm25
        |FROM tf JOIN dfq USING (t) JOIN pop USING (doc_id), stats
        |GROUP BY tf.doc_id
        |ORDER BY tf.doc_id""".stripMargin) { (s, dir) =>
      CorpusScoring.bm25Score(t(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "merge", "window"))
        .orderBy("doc_id")
    },

    // T22 — reference-corpus quality classifier (the fastText-shaped
    // linear filter): multinomial NB trained on a weak label (reference
    // set = lang 'en' here; production = a curated corpus), every doc
    // scored by reference log-odds. Training is counting, so DuckDB
    // replays the learned weights and scores exactly.
    "t22_quality_classifier" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE text IS NOT NULL
        |),
        |pop AS (SELECT * FROM d WHERE len(ws) > 0),
        |occ AS (SELECT doc_id, y, unnest(ws) AS w FROM pop),
        |pri AS (SELECT SUM(y) AS npos, SUM(1 - y) AS nneg FROM pop),
        |cw AS (SELECT w, SUM(y) AS cpos, SUM(1 - y) AS cneg FROM occ GROUP BY 1),
        |tot AS (SELECT SUM(cpos) AS tp, SUM(cneg) AS tn, COUNT(*) AS v FROM cw)
        |SELECT occ.doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       ROUND(ln((pri.npos + 1.0) / (pri.nneg + 1.0)) +
        |             SUM(ln((cw.cpos + 1.0) / (tot.tp + tot.v)) -
        |                 ln((cw.cneg + 1.0) / (tot.tn + tot.v))), 6) AS log_odds,
        |       CAST(CASE WHEN ROUND(ln((pri.npos + 1.0) / (pri.nneg + 1.0)) +
        |             SUM(ln((cw.cpos + 1.0) / (tot.tp + tot.v)) -
        |                 ln((cw.cneg + 1.0) / (tot.tn + tot.v))), 6) > 0
        |            THEN 1 ELSE 0 END AS BIGINT) AS predicted
        |FROM occ JOIN cw USING (w), pri, tot
        |GROUP BY occ.doc_id, pri.npos, pri.nneg
        |ORDER BY occ.doc_id""".stripMargin) { (s, dir) =>
      graft.text.QualityClassifier
        .naiveBayesScore(t(s, dir, "documents"), "doc_id", "text",
          col("lang") === "en")
        .orderBy("doc_id")
    },

    "t4_fingerprint" -> withOracle(
      """SELECT doc_id,
        |       list_reduce(
        |         list_prepend(CAST(0 AS BIGINT),
        |           list_transform(string_split_regex(text, ''), c -> CAST(unicode(c) AS BIGINT))),
        |         (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), rolling_hash(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    },

    // T35 — overlapping token-window chunking (RAG / context-window
    // prep): each document explodes into 64-token windows every 32
    // tokens, so consecutive chunks share half their tokens and no
    // token is orphaned. Pure map-side (tokenize → arithmetic →
    // explode → slice), no shuffle until the final ORDER BY — at 100 TB
    // this runs as a single scan-and-write with perfect parallelism.
    // Chunks travel as md5 digests to keep the verified output compact;
    // the oracle replays the identical tokenization, window arithmetic,
    // 1-based slices, and digest.
    "t35_chunk" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, words,
        |         1 + (GREATEST(0, len(words) - 64) + 31) // 32 AS nchunks
        |  FROM d
        |)
        |SELECT doc_id,
        |       CAST(k AS BIGINT) AS chunk_idx,
        |       CAST(len(words[k*32+1 : k*32+64]) AS BIGINT) AS n_tokens,
        |       md5(array_to_string(words[k*32+1 : k*32+64], ' ')) AS chunk_md5
        |FROM c, unnest(range(nchunks)) AS t(k)
        |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      val W = 64; val S = 32
      t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("words"))
        .withColumn("n", size(col("words")).cast("long"))
        .withColumn("nchunks",
          expr(s"1L + (greatest(0L, n - $W) + ${S - 1}) DIV $S"))
        .select(col("doc_id"), col("words"),
          explode(sequence(lit(0L), col("nchunks") - 1)).as("chunk_idx"))
        .withColumn("chunk",
          slice(col("words"), (col("chunk_idx") * S + 1).cast("int"), lit(W)))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).cast("long").as("n_tokens"),
          md5(array_join(col("chunk"), " ").cast("binary")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },

    // T37 — per-group top-k via the MERGEABLE top_k aggregate (the v10
    // machinery on the relational surface): top-3 longest documents per
    // language. The window translation (`row_number() OVER (PARTITION
    // BY lang ORDER BY ...)`) shuffles EVERY row to its group's
    // reducer; the aggregate keeps an O(k) heap per group per map task
    // and shuffles only O(groups × k) state — the difference between a
    // full-corpus shuffle and kilobytes at 100 TB. Oracle: the ranked
    // window with the identical (score desc, id asc) tiebreak.
    "t37_topk_group" -> withOracle(
      """SELECT lang, CAST(rn AS BIGINT) AS rank, doc_id,
        |       CAST(n_chars AS BIGINT) AS n_chars
        |FROM (
        |  SELECT lang, doc_id, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY lang
        |           ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 3
        |ORDER BY lang, rank""".stripMargin) { (s, dir) =>
      import graft.functions.TopKAgg.top_k
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(top_k(col("n_chars").cast("double"), col("doc_id"), 3).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("r0", "t")))
        .select(col("lang"), (col("r0") + 1).cast("long").as("rank"),
          col("t.id").as("doc_id"), col("t.score").cast("long").as("n_chars"))
        .orderBy("lang", "rank")
    },

    // D9 — PERSISTED incremental near-dup index, engine-served: band
    // buckets and corpus texts live as graft tables (built on the even
    // doc ids, APPENDED with the odd ones — the continuous-crawl path),
    // and a new batch's near-dups are found via POINT LOOKUPS into the
    // matching buckets plus exact-Jaccard verification against only the
    // fetched candidates — never a corpus scan or corpus-wide join: the
    // "dedup today's crawl against the 100-TB corpus" serving shape
    // (SearchIndex's playbook applied to near-duplication). Oracle: the
    // exact batch-vs-corpus Jaccard pairs (the d3 precedent — at 64
    // bands recall at j>=0.5 is 1-1e-8, and index serving reads
    // matching buckets in full, so no cap can cost recall).
    "d9_lsh_index" -> withOracle(
      """WITH bw AS (
        |  SELECT doc_id + 900000000 AS qid,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE doc_id < 50 AND text IS NOT NULL
        |), bsh AS (
        |  SELECT DISTINCT qid,
        |         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS s
        |  FROM bw WHERE len(ws) >= 2
        |), cw AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE text IS NOT NULL
        |), csh AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS s
        |  FROM cw WHERE len(ws) >= 2
        |), bn AS (SELECT qid, COUNT(*) AS n FROM bsh GROUP BY 1),
        |cn AS (SELECT doc_id, COUNT(*) AS n FROM csh GROUP BY 1),
        |inter AS (
        |  SELECT qid, doc_id, COUNT(*) AS i
        |  FROM bsh JOIN csh USING (s) GROUP BY 1, 2
        |)
        |SELECT qid, doc_id,
        |       ROUND(i * 1.0 / (bn.n + cn.n - i), 6) AS jaccard
        |FROM inter JOIN bn USING (qid) JOIN cn USING (doc_id)
        |WHERE i * 1.0 / (bn.n + cn.n - i) >= 0.5
        |ORDER BY qid, doc_id""".stripMargin) { (s, dir) =>
      val base = lshIndexDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-lshindex").toString
        val docs = t(s, dir, "documents").filter(col("text").isNotNull)
        graft.dedup.LshIndex.build(s, docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", s"$b/index")
        graft.dedup.LshIndex.append(s, s"$b/index",
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        b
      })
      val batch = t(s, dir, "documents")
        .filter(col("doc_id") < 50 && col("text").isNotNull)
        .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      graft.dedup.LshIndex.findNearDups(s, s"$base/index", batch,
          "doc_id", "text", threshold = 0.5)
        .select(col("qid"), col("doc_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("qid", "doc_id")
    },

    // T39 — stratified sampling with EXACT per-stratum caps: k docs per
    // language, selected by a deterministic hash order (the
    // reproducible-subsample shape every balanced-corpus recipe needs —
    // rerunning the pipeline on the same corpus yields the same
    // sample, and no stratum exceeds its cap). The hash is plain
    // arithmetic both engines share; selection "k smallest (h, doc_id)
    // per lang" runs as the mergeable top_k aggregate on the NEGATED
    // hash — O(strata × k) heap state shuffles instead of the window
    // translation's full corpus, the t37/v10 machinery. h < 2^30 and
    // doc_id-scaled products stay far below 2^63, so ANSI mode never
    // trips. Oracle: the ranked window under the identical total order.
    "t39_stratified_sample" -> withOracle(
      """WITH h AS (
        |  SELECT lang, doc_id, (doc_id * 2654435761) % 1000000007 AS h
        |  FROM documents
        |), r AS (
        |  SELECT lang, doc_id, h,
        |         ROW_NUMBER() OVER (PARTITION BY lang
        |           ORDER BY h, doc_id) AS rn
        |  FROM h
        |)
        |SELECT lang, doc_id, CAST(h AS BIGINT) AS h
        |FROM r WHERE rn <= 50
        |ORDER BY lang, h, doc_id""".stripMargin) { (s, dir) =>
      import graft.functions.TopKAgg.top_k
      t(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          (col("doc_id") * lit(2654435761L) % lit(1000000007L)).as("h"))
        // top_k keeps the GREATEST scores; negate so "k smallest h"
        // rides the same mergeable heap (h < 2^30: double-exact)
        .groupBy("lang")
        .agg(top_k(-col("h").cast("double"), col("doc_id"), 50).as("tk"))
        .select(col("lang"), explode(col("tk")).as("e"))
        .select(col("lang"), col("e.id").as("doc_id"),
          (-col("e.score")).cast("long").as("h"))
        .orderBy("lang", "h", "doc_id")
    },

    // T42 — LEAKAGE-SAFE TRAIN/VAL/TEST SPLIT: the assignment unit is
    // the near-dup CLUSTER (d5's closure), so no near-dup pair can
    // cross the train/eval boundary — per-document hashing would leak a
    // test document's near-copy into train ~80% of the time. The bucket
    // is the repo-standard Knuth multiplicative hash of the cluster id,
    // so the oracle replays the exact assignment. Oracle: d5's
    // recursive-CTE components (MIN reachable label == the Spark
    // components' min-id convention) + the same arithmetic. The
    // candidate step is EXACT prefix filtering (PPJoin, Xiao et al.
    // 2008): under a global rarity order, any pair with Jaccard >= 0.5
    // shares a shingle inside both docs' (n - ceil(0.5 n) + 1)-prefixes,
    // plus the length filter (J >= 0.5 forces sizes within 2x); exact
    // Jaccard is then verified per candidate with a sorted-hash-list
    // intersection instead of re-expanding shingle rows — same pairs
    // (verified row-identical at sf0.01/sf0.1), no common-shingle
    // bucket blowup (the all-pairs form spilled 78 GB at x10).
    "t42_leakage_split" -> withOracle(
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingle
        |  FROM toks WHERE len(ws) >= 2
        |), shh AS (
        |  SELECT doc_id, hash(shingle) AS h FROM sh
        |), sets AS (
        |  SELECT doc_id, list_sort(list(h)) AS hs, count(*) AS n FROM shh GROUP BY doc_id
        |), freq AS (SELECT h, count(*) AS c FROM shh GROUP BY h),
        |ordered AS (
        |  SELECT s.doc_id, s.h, z.n,
        |         ROW_NUMBER() OVER (PARTITION BY s.doc_id ORDER BY f.c, s.h) AS rnk
        |  FROM shh s JOIN freq f ON f.h = s.h JOIN sets z ON z.doc_id = s.doc_id
        |), pfx AS (
        |  SELECT doc_id, h, n, rnk FROM ordered
        |  WHERE rnk <= n - CAST(ceil(0.5 * n) AS BIGINT) + 1
        |), cand AS (
        |  -- PPJoin positional filter: at a matching prefix token, the
        |  -- achievable overlap is bounded by the shorter remaining
        |  -- suffix; J>=0.5 needs overlap >= ceil((na+nb)/3), so pairs
        |  -- whose BEST position pair cannot reach it are pruned before
        |  -- the exact intersect (never drops a true pair)
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM pfx a JOIN pfx b ON a.h = b.h AND a.doc_id < b.doc_id
        |    AND b.n * 2 >= a.n AND a.n * 2 >= b.n
        |    AND least(a.n - a.rnk, b.n - b.rnk) + 1 >= ceil((a.n + b.n) / 3.0)
        |), inter AS (
        |  SELECT id_a, id_b, len(list_intersect(hsa, hsb)) AS i, na, nb FROM (
        |    SELECT c.id_a, c.id_b, sa.hs AS hsa, sb.hs AS hsb, sa.n AS na, sb.n AS nb
        |    FROM cand c JOIN sets sa ON sa.doc_id = c.id_a JOIN sets sb ON sb.doc_id = c.id_b)
        |), pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  WHERE i * 1.0 / (na + nb - i) >= 0.5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), reach(id, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.id
        |), comp AS (
        |  SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id
        |)
        |SELECT doc_id, cluster_id,
        |       CASE WHEN (cluster_id * 2654435761) % 1000000007 % 100 < 80 THEN 'train'
        |            WHEN (cluster_id * 2654435761) % 1000000007 % 100 < 90 THEN 'validation'
        |            ELSE 'test' END AS split
        |FROM comp
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.text.DatasetSplit.leakageSafeSplit(
          t(s, dir, "documents"), "doc_id", "text", n = 2, threshold = 0.5)
        .select("doc_id", "cluster_id", "split")
        .orderBy("doc_id")
    },

    // T43 — MARKUP STRIPPING (the first transform a web-crawl corpus
    // needs): each document rides inside a synthetic HTML shell with a
    // style block, a script block, attribute-bearing tags, and escaped
    // entities; stripMarkup must recover exactly `text` plus the
    // decoded entity tail. Both engines build the same shell and
    // compare md5+length of the stripped result, so the whole
    // regexp/replace chain (incl. the decode-after-strip and
    // &amp;-last ordering) is pinned cross-engine.
    "t43_markup_strip" -> withOracle(
      """WITH wrapped AS (
        |  SELECT doc_id,
        |         '<html><head><style>p{color:red}</style></head><body><p class="d">'
        |           || text ||
        |           '</p><script>var x=1;</script> &amp;lt;tag&amp;gt; &quot;done&#39; </body></html>' AS w
        |  FROM documents
        |), stripped AS (
        |  SELECT doc_id,
        |         trim(regexp_replace(
        |           replace(replace(replace(replace(replace(replace(
        |             regexp_replace(
        |               regexp_replace(w, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
        |               '<[^>]*>', ' ', 'g'),
        |             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |           '[ \t\n\r]+', ' ', 'g')) AS s
        |  FROM wrapped
        |)
        |SELECT doc_id, md5(s) AS h, CAST(length(s) AS BIGINT) AS n
        |FROM stripped
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val wrapped = concat(
        lit("<html><head><style>p{color:red}</style></head><body><p class=\"d\">"),
        col("text"),
        lit("</p><script>var x=1;</script> &amp;lt;tag&amp;gt; &quot;done&#39; </body></html>"))
      val stripped = TextFunctions.stripMarkup(wrapped)
      t(s, dir, "documents")
        .select(col("doc_id"), md5(stripped.cast("binary")).as("h"),
          length(stripped).cast("long").as("n"))
        .orderBy("doc_id")
    },

    // T44 — Gopher-rules quality filter (Rae et al. 2021 §A1.1): the
    // standard web-corpus pre-filter as per-rule booleans + the keep
    // conjunction. Every signal is one pass over the doc's word/line
    // arrays inside the scan projection — at 100 TB this runs as a
    // map-only stage with zero shuffle, and per-rule rejection rates
    // fall out of a follow-up groupBy.
    "t44_gopher_filter" -> withOracle(
      """WITH d AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS ws,
        |         string_split(text, chr(10)) AS ls
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    len(ws) AS n,
        |    list_sum(list_transform(ws, w -> length(w))) * 1.0 / len(ws) AS mean_len,
        |    (length(text) - length(replace(text, '#', '')))
        |      + (length(text) - length(replace(text, '...', ''))) / 3
        |      + (length(text) - length(replace(text, '…', ''))) AS symbols,
        |    len(ls) AS n_lines,
        |    len(list_filter(ls, l -> regexp_matches(ltrim(l), '^[-*•]'))) AS bullet_lines,
        |    len(list_filter(ls, l -> regexp_matches(rtrim(l), '(\.\.\.|…)$'))) AS ellipsis_lines,
        |    len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
        |    len(list_intersect(list_transform(ws, w -> lower(w)),
        |        ['the','be','to','of','and','that','have','with'])) AS stop_hits
        |  FROM d
        |)
        |SELECT doc_id,
        |  CAST(n AS BIGINT) AS n_words,
        |  n >= 50 AND n <= 100000 AS ok_word_count,
        |  n > 0 AND mean_len >= 3.0 AND mean_len <= 10.0 AS ok_mean_word_len,
        |  n > 0 AND symbols * 1.0 / n <= 0.1 AS ok_symbol_ratio,
        |  bullet_lines * 1.0 / n_lines <= 0.9 AS ok_bullet_lines,
        |  ellipsis_lines * 1.0 / n_lines <= 0.3 AS ok_ellipsis_lines,
        |  n > 0 AND alpha_words * 1.0 / n >= 0.8 AS ok_alpha_words,
        |  stop_hits >= 2 AS ok_stopwords,
        |  (n >= 50 AND n <= 100000) AND (n > 0 AND mean_len >= 3.0 AND mean_len <= 10.0)
        |    AND (n > 0 AND symbols * 1.0 / n <= 0.1)
        |    AND bullet_lines * 1.0 / n_lines <= 0.9
        |    AND ellipsis_lines * 1.0 / n_lines <= 0.3
        |    AND (n > 0 AND alpha_words * 1.0 / n >= 0.8)
        |    AND stop_hits >= 2 AS keep
        |FROM m
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val rules = TextFunctions.gopherRules(col("text"))
      val ruleCols = rules.map { case (name, c) => c.as(name) }
      val keep = rules.collect { case (n, c) if n.startsWith("ok_") => c }
        .reduce(_ && _)
      t(s, dir, "documents")
        .select((col("doc_id") +: ruleCols :+ keep.as("keep")): _*)
        .orderBy("doc_id")
    }
  )
}
