package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup
import graft.functions.RollingHash.rolling_hash
import graft.text.TextFunctions

/** Training-data text pipeline: deduplication (exact, n-gram Jaccard,
  * MinHash+LSH, SimHash), language-ID, quality scoring, token counting,
  * fingerprinting — each over the `documents` table with a DuckDB oracle
  * where SQL can express the same computation.
  */
object TextQueries {

  import QueryDef._

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

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

    // D4 — SimHash near-dup pairs. The token hash family is a rolling
    // hash (mod 1e9+7) expanded to 64 bits by an affine map mod 2^31-1 —
    // plain integer arithmetic (HashOps.simhash scaladoc), so the oracle
    // replays the exact fingerprints: per-bit votes over distinct
    // tokens, 16-bit pigeonhole segments for candidates, hamming <= 3.
    "d4_simhash" -> withOracle(
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS w
        |  FROM documents
        |), base AS (
        |  SELECT doc_id,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(string_split_regex(w, ''), c -> CAST(unicode(c) AS BIGINT))),
        |           (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        |  FROM toks
        |), bits AS (
        |  SELECT doc_id, i.range AS i,
        |         CASE WHEN SUM(CASE WHEN ((h * (1013904223 + 2*i.range) + i.range * 2654435761)
        |                                  % 2147483647 // 4096) % 2 = 1
        |                       THEN 1 ELSE -1 END) > 0
        |              THEN 1 ELSE 0 END AS bit
        |  FROM base, range(64) i
        |  GROUP BY doc_id, i.range
        |), seg AS (
        |  SELECT doc_id, i // 16 AS seg, SUM(bit << CAST(i % 16 AS INT)) AS v
        |  FROM bits GROUP BY 1, 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM seg a JOIN seg b ON a.seg = b.seg AND a.v = b.v AND a.doc_id < b.doc_id
        |), ham AS (
        |  SELECT c.id_a, c.id_b,
        |         SUM(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS hd
        |  FROM cand c
        |  JOIN bits ba ON ba.doc_id = c.id_a
        |  JOIN bits bb ON bb.doc_id = c.id_b AND ba.i = bb.i
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b, CAST(hd AS INT) AS hamming
        |FROM ham WHERE hd <= 3
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
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
    }
  )
}
