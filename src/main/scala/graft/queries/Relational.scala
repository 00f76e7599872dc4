package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{KeyRange, Region}

/** Core operator parity with the reference (SURVEY.md §2): scan/projection,
  * multidimensional region filters, ageOff, key-equal aggregation, sorted
  * merge, limit/topk, set ops, and the compaction dataflow expressed as a
  * query. Each entry has a DuckDB oracle.
  */
object Relational {

  import QueryDef._

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val defs: Map[String, QueryDef] = Map(

    // S1/P1 — sorted parquet scan + projection + predicate pushdown.
    // (reference: ParquetRowReaderFactory / LeafPartitionQueryExecutor
    // createSchemaForDataRead:105-131)
    "s1_scan_project" -> withOracle(
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P2 — multidimensional range predicate: OR over regions, AND over
    // dimensions, canonical [min,max). Built through graft.core.Region
    // (reference: RangeQueryUtils.getFilterPredicateMultidimensionalKey:48-56,
    // rust region.rs).
    "p2_region_filter" -> withOracle(
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE (l_orderkey >= 100 AND l_orderkey < 2000
        |       AND l_linenumber >= 1 AND l_linenumber < 4)
        |   OR (l_orderkey >= 3000 AND l_orderkey < 4000)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val regions = Seq(
        Region(KeyRange.minMax("l_orderkey", 100L, 2000L),
               KeyRange.minMax("l_linenumber", 1, 4)),
        Region(KeyRange.minMax("l_orderkey", 3000L, 4000L)))
      t(s, dir, "lineitem")
        .filter(Region.anyOf(regions))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P3 — ageOff filter (TTL): drop rows older than a max age relative to
    // a reference "now"; null timestamp also dropped. Fixed cutoff for
    // determinism. ts is epoch-nanos read as long.
    // (reference: AgeOffFilter.java:32-86, rust ageoff.rs:40-193)
    // (µs precision in both engines: DuckDB truncates TIMESTAMP_NS to µs
    // in epoch_* functions, so we divide the nanos long down to match.)
    "p3_ageoff" -> withOracle(
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
        |FROM events
        |WHERE ts IS NOT NULL AND epoch_us(ts) > 1705276800000000
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val cutoffUs = 1705276800000000L // 2024-01-15T00:00:00Z, mid-range of the event stream
      t(s, dir, "events")
        .filter(col("ts").isNotNull && expr("ts DIV 1000") > lit(cutoffUs))
        .select(col("event_id"), expr("ts DIV 1000").as("ts_us"), col("user_id"), col("event_type"))
        .orderBy("event_id")
    },

    // P4 — generic predicate filter (reference: FilteringIterator.java:26-68)
    "p4_filter" -> withOracle(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity >= 30 AND l_quantity < 40 AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 30 && col("l_quantity") < 40 && col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P5 — security-label style filter: value in allowed set, or
    // null/empty label (reference: SecurityFilteringIterator.java:36-75)
    "p5_security_filter" -> withOracle(
      """SELECT doc_id, lang, source
        |FROM documents
        |WHERE lang IN ('en','fr') OR lang IS NULL OR lang = ''
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .filter(col("lang").isin("en", "fr") || col("lang").isNull || col("lang") === "")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // A1/A2 — key-equal aggregation: group by (row keys ++ sort keys),
    // sum/min/max value fields. Decimal accumulate → double output so the
    // result is order-independent and engine-exact.
    // (reference: AggregationIterator.java:36-64, AggregationOp.java:24-161)
    "a1_agg_keys" -> withOracle(
      """SELECT user_id, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       MIN(value) AS min_value,
        |       MAX(value) AS max_value
        |FROM events
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy("user_id", "event_type")
    },

    // A2 (string ops) — string min/max (lexicographic) and order-defined
    // concat-sum (reference concatenates key-equal rows where relative
    // order is undefined; we pin sorted order so it is testable).
    "a2_agg_string_ops" -> withOracle(
      """SELECT lang,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       MIN(source) AS min_source,
        |       MAX(source) AS max_source,
        |       STRING_AGG(source, ',' ORDER BY source) AS concat_source
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { (s, dir) =>
      // Ties in the sort order are identical strings, so sorted-concat is
      // well-defined and equal in both engines.
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n"),
          min("source").as("min_source"),
          max("source").as("max_source"),
          array_join(array_sort(collect_list(col("source"))), ",").as("concat_source"))
        .orderBy("lang")
    },

    // O1 — N-way sorted merge: union-all of sorted runs + global sort on
    // (row keys, sort keys) (reference: MergingIterator.java:37-114; Spark
    // realises it as a range-partitioned sort over the unioned scan).
    "o1_sorted_merge" -> withOracle(
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT * FROM lineitem WHERE l_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT * FROM lineitem WHERE l_orderkey % 2 = 1
        |)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      li.filter(col("l_orderkey") % 2 === 0)
        .unionByName(li.filter(col("l_orderkey") % 2 === 1))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // O4 — limit (reference: LimitingIterator.java:25-52)
    "o4_limit" -> withOracle(
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    },

    // O5 — top-k (Spark superset; TakeOrderedAndProject physical op)
    "o5_topk" -> withOracle(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 50""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
    },

    // U1 — union-all (a table IS the union of its files in the reference)
    "u1_union_all" -> withOracle(
      """SELECT src, c_custkey, c_acctbal FROM (
        |  SELECT 'lo' AS src, c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0
        |  UNION ALL
        |  SELECT 'hi' AS src, c_custkey, c_acctbal FROM customer WHERE c_acctbal >= 9000
        |)
        |ORDER BY src, c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      c.filter(col("c_acctbal") < 0).select(lit("lo").as("src"), col("c_custkey"), col("c_acctbal"))
        .unionByName(
          c.filter(col("c_acctbal") >= 9000).select(lit("hi").as("src"), col("c_custkey"), col("c_acctbal")))
        .orderBy("src", "c_custkey")
    },

    // U2 — distinct
    "u2_distinct" -> withOracle(
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // U3 — intersect (Spark superset)
    "u3_intersect" -> withOracle(
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // U4 — except (Spark superset)
    "u4_except" -> withOracle(
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // M1/T3 — compaction as a dataflow: union of overlapping sorted files
    // → partition-region filter → merge rows equal on the full key by
    // aggregation → sorted output. This is the reference's core pipeline
    // (rust datafusion.rs:131-139) expressed as one declarative plan.
    "m1_compaction_merge" -> withOracle(
      """SELECT l_orderkey, l_linenumber,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n_merged
        |FROM (
        |  SELECT * FROM lineitem
        |  UNION ALL
        |  SELECT * FROM lineitem WHERE l_orderkey % 3 = 0
        |)
        |WHERE l_orderkey >= 0 AND l_orderkey < 3000
        |GROUP BY l_orderkey, l_linenumber
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val files = li.unionByName(li.filter(col("l_orderkey") % 3 === 0))
      files
        .filter(Region(KeyRange.minMax("l_orderkey", 0L, 3000L)).toColumn)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n_merged"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // M3/A5 — partition-split point: per-group discrete median of the key
    // distribution (the reference finds split points from quantile
    // sketches; exact discrete median here so the oracle is exact).
    // (reference: FindPartitionSplitPoint.java:45-89)
    "m3_split_points" -> withOracle(
      """SELECT l_returnflag, l_quantity AS split_point FROM (
        |  SELECT l_returnflag, l_quantity,
        |         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
        |         COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM lineitem
        |)
        |WHERE rn = CAST(FLOOR((cnt + 1) / 2.0) AS BIGINT)
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_returnflag")
      val wo = w.orderBy("l_quantity", "l_orderkey", "l_linenumber")
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(wo))
        .withColumn("cnt", count(lit(1)).over(w))
        .filter(col("rn") === floor((col("cnt") + 1) / 2.0).cast("long"))
        .select(col("l_returnflag"), col("l_quantity").as("split_point"))
        .orderBy("l_returnflag")
    }
  )
}
