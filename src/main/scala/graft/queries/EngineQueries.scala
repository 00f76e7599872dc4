package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.Tables
import graft.core.{GraftField, GraftSchema}
import graft.dsl.ConfigDsl
import graft.functions.{KeySketch, MapMergeAgg, QuantileSketchAgg}

/** Queries that exercise the engine's custom Catalyst pieces (map
  * aggregation UDAF, config DSL, quantile sketches) through the DuckDB
  * correctness gate. The map aggregate is verified by exploding the
  * aggregated map back to rows, which an equivalent GROUP BY expresses
  * in plain SQL.
  */
object EngineQueries {

  import QueryDef._

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val defs: Map[String, QueryDef] = Map(

    // A3 — map_sum: build a single-entry map per row, merge key-wise per
    // group, explode back. Equivalent SQL: group by (key, map-key).
    // (reference: AggregationOp.handleMap:163-215, rust map_aggregate.rs)
    "a3_agg_map_sum" -> withOracle(
      """SELECT l_orderkey, l_returnflag AS flag,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY l_orderkey, flag
        |ORDER BY l_orderkey, flag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          map(col("l_returnflag"), col("l_quantity").cast("long")).as("m"))
        .groupBy("l_orderkey")
        .agg(MapMergeAgg.map_sum(col("m")).as("m"))
        .select(col("l_orderkey"), explode(col("m")).as(Seq("flag", "qty")))
        .orderBy("l_orderkey", "flag")
    },

    // A3 — map_max over string-keyed map of longs.
    "a3_agg_map_max" -> withOracle(
      """SELECT user_id, event_type AS etype,
        |       CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
        |FROM events
        |GROUP BY user_id, etype
        |ORDER BY user_id, etype""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(col("user_id"), map(col("event_type"), expr("ts DIV 1000")).as("m"))
        .groupBy("user_id")
        .agg(MapMergeAgg.map_max(col("m")).as("m"))
        .select(col("user_id"), explode(col("m")).as(Seq("etype", "last_us")))
        .orderBy("user_id", "etype")
    },

    // X3 — the aggregation-config DSL driving a real aggregation plan:
    // parse "sum(qty_l),min(price_l),max(price_l2)" against a schema and
    // let the generated columns run (reference: Aggregation.parseConfig +
    // IteratorFactory wiring).
    "x3_agg_dsl" -> withOracle(
      """SELECT l_orderkey, l_linenumber,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_l,
        |       CAST(MIN(CAST(l_partkey AS BIGINT)) AS BIGINT) AS part_min,
        |       CAST(MAX(CAST(l_suppkey AS BIGINT)) AS BIGINT) AS supp_max
        |FROM lineitem
        |GROUP BY l_orderkey, l_linenumber
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val schema = GraftSchema(
        rowKeys = Seq(GraftField("l_orderkey", LongType)),
        sortKeys = Seq(GraftField("l_linenumber", IntegerType)),
        values = Seq(GraftField("qty_l", LongType), GraftField("part_min", LongType),
          GraftField("supp_max", LongType)))
      val specs = ConfigDsl.parseAggregation("sum(qty_l),min(part_min),max(supp_max)", schema)
      val cols = ConfigDsl.aggColumns(specs, schema)
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty_l"),
          col("l_partkey").as("part_min"), col("l_suppkey").as("supp_max"))
        .groupBy("l_orderkey", "l_linenumber")
        .agg(cols.head, cols.tail: _*)
        .orderBy("l_orderkey", "l_linenumber")
    },

    // A4/A5 — quantile sketch build + median extraction. Groups here
    // (documents per lang) stay below the sketch's exact-mode capacity,
    // so the sketch median IS the exact discrete median and the oracle
    // checks the full sketch pipeline (build, serialize, merge across
    // partitions, query). Error bounds of the approximate regime are
    // asserted in AggregatesSpec. (reference: Sketches.java,
    // FindPartitionSplitPoint.)
    "a4_sketch_median" -> withOracle(
      """SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS median_chars
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { (s, dir) =>
      val medianUdf = udf { bytes: Array[Byte] =>
        val kind = KeySketch.LongKind
        val sk = KeySketch.deserialize(kind, bytes)
        // exact regime: every item retained, so the INCLUSIVE quantile
        // IS quantile_disc — the x10 sweep caught the K=1024 engine
        // default leaving this regime (median 302 vs 301); the row now
        // pins a larger K and trips loudly instead of drifting
        require(sk.getN == sk.getNumRetained,
          s"a4_sketch_median oracle is only valid while the sketch retains " +
            s"every item (n=${sk.getN}, retained=${sk.getNumRetained}); " +
            "raise k — approximate-regime error bounds are AggregatesSpec-gated")
        sk.getQuantile(0.5,
          org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
          .asInstanceOf[java.lang.Long].longValue()
      }
      t(s, dir, "documents")
        .select(col("lang"), col("n_chars").cast("long").as("q"))
        .groupBy("lang")
        .agg(QuantileSketchAgg.sketch_agg(col("q"), k = 32768).as("sk"))
        .select(col("lang"), medianUdf(col("sk")).as("median_chars"))
        .orderBy("lang")
    },

    // A8 — mergeable KMV distinct-count sketch, grouped: distinct parts
    // per return flag in ONE pass (no distinct shuffle — partial sketch
    // buffers merge map-side). Below the k=4096 capacity the sketch is
    // exact, so the oracle is plain COUNT(DISTINCT); the estimator
    // regime past capacity (the 100-TB case: pre-sizing a join's key
    // space without paying a shuffle for it) is gated in
    // FrequencySketchesSpec (relative error ~1/sqrt(k)). The estimate is
    // drawn through a regime-asserting extractor, so pointing Verify at
    // an sf whose per-group distinct count exceeds k fails fast with a
    // clear message instead of silently hash-mismatching the oracle.
    "a8_distinct_sketch" -> withOracle(
      """SELECT l_returnflag AS flag,
        |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nd
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY flag""".stripMargin) { (s, dir) =>
      import graft.functions.FrequencySketches._
      // k=65536 keeps the row in the exact regime through sf0.1 (~20k
      // distinct parts per flag); the estimator regime stays spec-gated
      val exactEstimate = udf { (sk: Array[Byte]) =>
        require(kmvIsExact(sk),
          "a8_distinct_sketch oracle is only valid in the KMV exact regime " +
            "(per-group distinct count < k=65536); this sf exceeds capacity — " +
            "raise k or check against FrequencySketchesSpec's estimator gates")
        kmvEstimate(sk)
      }
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(kmv_sketch(col("l_partkey"), k = 65536).as("sk"))
        .select(col("flag"), exactEstimate(col("sk")).as("nd"))
        .orderBy("flag")
    },

    // A9 — mergeable Misra-Gries heavy hitters: the Zipf head of
    // lineitem's supplier key in ONE pass — the hot-key list
    // SkewJoin.hotSplit broadcasts, computed without a full groupBy
    // shuffle (only O(partitions × capacity) sketch partials move).
    // Below capacity the counts are exact, so the oracle is the plain
    // GROUP BY top-10 under the same (count desc, key asc) total order.
    "a9_heavy_hitters" -> withOracle(
      """SELECT l_suppkey, CAST(cnt AS BIGINT) AS cnt
        |FROM (SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1)
        |ORDER BY cnt DESC, l_suppkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .agg(graft.functions.FrequencySketches.heavy_hitters(col("l_suppkey")).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("l_suppkey"), col("e.count").as("cnt"))
        // the sketch already emits (count desc, item asc), but a LIMIT
        // prefix is only guaranteed under an explicit sort — don't rely
        // on the single-partition plan preserving array order
        .orderBy(col("cnt").desc, col("l_suppkey"))
        .limit(10)
    },

    // A10 — KMV set-operation estimates: the distinct part keys shipped
    // in 1994 vs 1995, their overlap and union — ONE corpus pass builds
    // both serialized sketches (`when()`-masked inputs), the O(k) blobs
    // come to the driver, and the set-op estimators answer without ever
    // shuffling the two key sets together (at 100 TB: profile a join's
    // key overlap for the cost of a map pass + 32 KB). Below capacity
    // both sketches hold their full hash sets, so all four numbers are
    // exact and the oracle is plain COUNT(DISTINCT)/INTERSECT/UNION —
    // note the union needs its OWN exactness check: the union buffer is
    // capped at min(kA, kB), so nd_union (and the intersect scaling) is
    // exact only while |A UNION B| < k, which two individually-exact
    // sketches don't imply. All three regimes are asserted below, so a
    // larger sf fails fast; the estimator regime past capacity is gated
    // in FrequencySketchesSpec.
    "a10_sketch_setops" -> withOracle(
      """WITH a AS (SELECT DISTINCT l_partkey FROM lineitem
        |           WHERE EXTRACT(year FROM l_shipdate) = 1996),
        |     b AS (SELECT DISTINCT l_partkey FROM lineitem
        |           WHERE EXTRACT(year FROM l_shipdate) = 1997)
        |SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS nd_a,
        |       CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS nd_b,
        |       CAST((SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS BIGINT) AS nd_common,
        |       CAST((SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS BIGINT) AS nd_union""".stripMargin) { (s, dir) =>
      import graft.functions.FrequencySketches._
      // 1996/1997 are populated in every generated sf (the corpus spans
      // 1995–2001; the original 1994 side was empty — a degenerate row);
      // k=65536 keeps both sketches AND their min(kA,kB)-capped union in
      // the exact regime through sf0.1 (~20k distinct parts a year)
      val row = t(s, dir, "lineitem").agg(
        kmv_sketch(when(year(col("l_shipdate")) === 1996, col("l_partkey")), k = 65536).as("sa"),
        kmv_sketch(when(year(col("l_shipdate")) === 1997, col("l_partkey")), k = 65536).as("sb"))
        .head() // two O(k) sketch blobs — the bounded driver set
      val sa = row.getAs[Array[Byte]]("sa")
      val sb = row.getAs[Array[Byte]]("sb")
      require(kmvIsExact(sa) && kmvIsExact(sb) && kmvUnionIsExact(sa, sb),
        "a10_sketch_setops oracle is only valid while both sketches AND " +
          "their union are below the KMV capacity; this sf exceeds it — " +
          "raise k or check against FrequencySketchesSpec's estimator gates")
      import s.implicits._
      Seq((kmvEstimate(sa), kmvEstimate(sb),
        kmvIntersectEstimate(sa, sb), kmvUnionEstimate(sa, sb)))
        .toDF("nd_a", "nd_b", "nd_common", "nd_union")
    },

    // A11 — Count-Min point-frequency sketch: the third one-pass
    // profiling leg next to KMV (how many distinct?) and Misra-Gries
    // (which keys dominate?) — "how often does key x occur", for ANY x,
    // answered after a single map pass from an O(depth × width) blob
    // with partials merging map-side; at 100 TB that's per-key rate
    // lookups over billions of keys without a groupBy shuffle. Below
    // the sparse capacity the sketch holds exact per-hash counts, so
    // the oracle is plain COUNT(*) per probed user (guarded — the
    // require trips beyond capacity); the dense estimator regime
    // (never underestimates, εN bound, merge == one-pass) is gated in
    // CountMinSketchSpec.
    "a11_countmin" -> withOracle(
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events WHERE user_id < 10
        |GROUP BY 1
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import graft.functions.CountMinSketch._
      val sk = t(s, dir, "events")
        .agg(cms_sketch(col("user_id")).as("sk"))
        .head().getAs[Array[Byte]]("sk") // one O(depth×width) blob
      require(cmsIsExact(sk),
        "a11_countmin oracle is only valid in the CMS exact (sparse) regime " +
          "(distinct users < capacity=65536); raise capacity at bigger sfs " +
          "or check against CountMinSketchSpec's estimator gates")
      import s.implicits._
      (0L until 10L).map(u => (u, cmsEstimateLong(sk, u)))
        .toDF("user_id", "cnt")
    },

    // A12 — mergeable HyperLogLog distinct count: fixed 16 KB per group
    // at ANY cardinality (p=14, ~0.81% standard error) — the constant-
    // memory complement of a8's KMV (exact below k, but O(k) memory).
    // An approximate estimator has no exact oracle; the CHECKABLE
    // property is its published error bound, so the row emits the exact
    // count and a bound assertion at 6x the standard error (pass
    // probability ~1 - 1e-9 per group; the estimator itself is
    // deterministic, so the sweep re-checks the same value).
    "a12_hll_distinct" -> withOracle(
      """SELECT l_returnflag AS flag,
        |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nd,
        |       true AS within_bound
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY flag""".stripMargin) { (s, dir) =>
      import graft.functions.FrequencySketches._
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(hll_distinct(col("l_partkey")).as("est"),
          countDistinct(col("l_partkey")).as("nd"))
        .select(col("flag"), col("nd"),
          (abs(col("est") - col("nd")).cast("double") /
            col("nd").cast("double") <= 0.05).as("within_bound"))
        .orderBy("flag")
    }
  )
}
