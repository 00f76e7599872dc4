package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Spark-superset surface: the reference has no joins, windows, scalar
  * functions or grouping sets (SURVEY.md §2 J1/W1/F1/A7) — users get them
  * via connectors (Trino/Athena/Spark DSv2) or the SELECT-only SQL
  * post-stage (X2). In a Spark-native engine they are first-class; these
  * queries pin their semantics against the DuckDB oracle.
  */
object Superset {

  import QueryDef._

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val defs: Map[String, QueryDef] = Map(

    // J — broadcast-hash join of fact to two dims + exact-decimal revenue
    // aggregation (TPC-H Q3 shape). Dims broadcast; only the fact shuffles.
    "j1_join_agg" -> withOracle(
      """SELECT o.o_orderkey,
        |       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate,
        |       o.o_orderpriority
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderkey, orderdate, o.o_orderpriority
        |ORDER BY revenue DESC, o.o_orderkey
        |LIMIT 20""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(broadcast(o.join(broadcast(c), o("o_custkey") === c("c_custkey"))),
          l("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderkey"),
          date_format(o("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          o("o_orderpriority"))
        .agg(sum((l("l_extendedprice") * (lit(1) - l("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .select(col("o_orderkey"), col("revenue"), col("orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(20)
    },

    // J — semi join (EXISTS)
    "j2_semi_join" -> withOracle(
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 100000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // J — anti join (NOT EXISTS)
    "j3_anti_join" -> withOracle(
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // W — ranking window: top-3 orders per customer by price.
    "w1_window_rank" -> withOracle(
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders
        |)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // W — running aggregate window (exact decimal accumulate per frame).
    "w2_window_running" -> withOracle(
      """SELECT event_id, user_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |            OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("running_value"))
        .orderBy("user_id", "event_id")
    },

    // A7 — rollup grouping sets.
    "g1_rollup" -> withOracle(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // A7 — full cube.
    "g2_cube" -> withOracle(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // A7 — explicit grouping sets (SQL form; Dataset API has no direct hook).
    "g3_grouping_sets" -> withOracle(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          |FROM gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // W1 — range-frame window (sliding sum over a value-ordered frame).
    "w3_window_frame" -> withOracle(
      """SELECT l_orderkey, l_linenumber,
        |       CAST(SUM(CAST(l_quantity AS BIGINT))
        |            OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS qty_win
        |FROM lineitem
        |WHERE l_orderkey < 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
        .rowsBetween(-1, 1)
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity").cast("long")).over(w).as("qty_win"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // F — scalar string functions.
    "f1_scalar_string" -> withOracle(
      """SELECT p_partkey,
        |       UPPER(p_brand) AS brand_upper,
        |       SUBSTRING(p_name, 1, 8) AS name_prefix,
        |       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        |       REPLACE(p_type, ' ', '_') AS type_snake,
        |       CONCAT(p_brand, ':', p_type) AS brand_type
        |FROM part
        |WHERE p_size >= 40
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_size") >= 40)
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_upper"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_replace(col("p_type"), " ", "_").as("type_snake"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey")
    },

    // F — scalar date/time functions (timestamps output as parts/strings).
    "f2_scalar_datetime" -> withOracle(
      """SELECT o_orderkey,
        |       CAST(YEAR(o_orderdate) AS INT) AS y,
        |       CAST(MONTH(o_orderdate) AS INT) AS m,
        |       CAST(DAY(o_orderdate) AS INT) AS d,
        |       STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
        |FROM orders
        |WHERE YEAR(o_orderdate) = 1997
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1997)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_format(col("o_orderdate") + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").as("due_date"))
        .orderBy("o_orderkey")
    },

    // F — JSON extraction from a string payload column.
    "f3_scalar_json" -> withOracle(
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    },

    // J4 — as-of join: every purchase picks up the latest same-user click
    // at or before it (operators/AsofJoin: union + one partitioned
    // window — no join, no per-row subquery). The oracle replays the
    // identical carry-forward; events.value is non-null in the corpus,
    // so per-column IGNORE NULLS in SQL equals the struct carry in code.
    "j4_asof_join" -> withOracle(
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) AS tn, event_id, value,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), w AS (
        |  SELECT *,
        |         last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER
        |           (PARTITION BY user_id ORDER BY tn, side, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_event_id,
        |         last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER
        |           (PARTITION BY user_id ORDER BY tn, side, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_value
        |  FROM ev
        |)
        |SELECT event_id, user_id, click_event_id, click_value
        |FROM w WHERE side = 1
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id", "value")
      graft.operators.AsofJoin.asof(purchases, clicks, "user_id", "ts",
          payloadCols = Seq("event_id", "value"), tieBreakCol = "event_id",
          payloadPrefix = "click_")
        .select("event_id", "user_id", "click_event_id", "click_value")
        .orderBy("event_id")
    },

    // J5 — range join without an equi key: customers whose balance falls
    // in a supplier's [acctbal, acctbal+100] band (operators/RangeJoin:
    // binned equi-join + exact filter — a plain hash join, where Spark's
    // native plan for the same predicate is a nested-loop cross).
    "j5_range_join" -> withOracle(
      """SELECT c.c_custkey, s.s_suppkey
        |FROM customer c JOIN supplier s
        |  ON c.c_acctbal >= s.s_acctbal AND c.c_acctbal <= s.s_acctbal + 100
        |ORDER BY c_custkey, s_suppkey""".stripMargin) { (s, dir) =>
      val points = t(s, dir, "customer").select("c_custkey", "c_acctbal")
      val bands = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_acctbal").as("lo"),
          (col("s_acctbal") + 100).as("hi"))
      graft.operators.RangeJoin.pointInInterval(points, "c_acctbal", bands,
          "lo", "hi", binWidth = 100.0)
        .select("c_custkey", "s_suppkey")
        .orderBy("c_custkey", "s_suppkey")
    },

    // J6 — salted skew join (operators/SkewJoin): same answer as the
    // plain lineitem⋈orders join — the oracle IS the plain join — with
    // the fact side split 8 ways per key so one hot orderkey cannot pin
    // a reducer.
    "j6_skew_salted" -> withOracle(
      """SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin) { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      graft.operators.SkewJoin.salted(l, o,
          (f, d) => f("l_orderkey") === d("o_orderkey"),
          saltFrom = struct(l("l_orderkey"), l("l_linenumber")), salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("o_orderpriority")
    },

    // W4 — sessionization: Spark's session_window (30-min inactivity gap)
    // over per-user event streams; the oracle rebuilds sessions with the
    // lag + running-sum formulation on the same microsecond timeline.
    // events.ts is epoch-nanos (TESTDATA nanos timestamp), truncated to
    // micros on both sides; session bounds output as epoch micros, so no
    // timezone enters the compare.
    "w4_sessionize" -> withOracle(
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tu, value FROM events
        |), marks AS (
        |  SELECT *, CASE WHEN tu - LAG(tu) OVER
        |                   (PARTITION BY user_id ORDER BY tu, event_id) > 1800000000
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |), sess AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tu, event_id
        |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marks
        |)
        |SELECT user_id, CAST(MIN(tu) AS BIGINT) AS session_start,
        |       CAST(MAX(tu) + 1800000000 AS BIGINT) AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(col("user_id"), col("value"),
          timestamp_micros(expr("ts DIV 1000")).as("tsm"))
        .groupBy(col("user_id"), session_window(col("tsm"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start"),
          unix_micros(col("session_window.end")).as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    },

    // W5 — progressive funnel (view → click → purchase, each step
    // strictly after the previous one for the same user): the classic
    // sequential-pattern analysis over an event stream. Each stage is a
    // conditional min-aggregate on user_id, and every stage re-shuffles
    // on the SAME key, so the per-step exchanges line up; the aggregated
    // step outputs are one-row-per-converted-user (≤ distinct users),
    // which AQE broadcasts into the next stage's join at any realistic
    // scale — the 100-TB cost is the per-step event-type filter scans,
    // not the joins. Strictly-after semantics (ts >, not >=) pin the
    // ordering contract against the oracle.
    "w5_funnel" -> withOracle(
      """WITH s1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
        |)
        |SELECT CAST(1 AS INT) AS step, 'view' AS event_type,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS users
        |UNION ALL
        |SELECT CAST(2 AS INT), 'click', (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
        |UNION ALL
        |SELECT CAST(3 AS INT), 'purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)
        |ORDER BY step""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
      val s1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      def cnt(df: DataFrame, step: Int, ev: String) = df
        .agg(count(lit(1)).as("users"))
        .select(lit(step).as("step"), lit(ev).as("event_type"), col("users"))
      cnt(s1, 1, "view").unionAll(cnt(s2, 2, "click")).unionAll(cnt(s3, 3, "purchase"))
        .orderBy("step")
    },

    // T7 — streaming event-time windowed aggregation (watermark + 1-day
    // tumbling windows, complete mode, AvailableNow drain). The oracle is
    // the equivalent batch rollup: on a drained bounded stream the two
    // must agree exactly.
    "t7_stream_window" -> withOracle(
      """SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_start,
        |       event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY day_start, event_type""".stripMargin) { (s, dir) =>
      graft.streaming.StreamAnalytics.dailyTypeRollup(s, dir)
        .orderBy("day_start", "event_type")
    },

    // T33 — SLIDING-window streaming rollup (1 day every 6 hours):
    // every event belongs to 4 overlapping windows. The oracle expands
    // each event into its 4 window starts arithmetically (Spark windows
    // are epoch-aligned UTC) and aggregates per start.
    "t33_stream_sliding" -> withOracle(
      """WITH e AS (
        |  SELECT epoch_us(ts) AS eu, value FROM events
        |), w AS (
        |  SELECT (eu - eu % 21600000000) - k * 21600000000 AS win_start, value
        |  FROM e, unnest(range(4)) AS t(k)
        |)
        |SELECT win_start,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w
        |GROUP BY 1
        |ORDER BY win_start""".stripMargin) { (s, dir) =>
      graft.streaming.StreamAnalytics.slidingRollup(s, dir)
        .orderBy("win_start")
    },

    // T30 — streaming windowed DISTINCT via the mergeable KMV sketch:
    // per-day distinct users over the event stream with O(k) state per
    // window instead of O(distinct) — the sketch-as-streaming-state
    // composition a 100-TB stream needs. k=65536 holds the exact
    // regime at the verified sfs (the require trips, not lies, beyond
    // it); oracle = exact per-day COUNT(DISTINCT).
    "t30_stream_distinct" -> withOracle(
      """SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_start,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd
        |FROM events
        |GROUP BY 1
        |ORDER BY day_start""".stripMargin) { (s, dir) =>
      import graft.functions.FrequencySketches._
      val exactEstimate = udf { (sk: Array[Byte]) =>
        require(kmvIsExact(sk),
          "t30_stream_distinct oracle is only valid in the KMV exact regime " +
            "(per-day distinct users < k=65536); raise k at bigger sfs")
        kmvEstimate(sk)
      }
      graft.streaming.StreamAnalytics.dailyDistinctUsersSketch(s, dir)
        .select(col("day_start"), exactEstimate(col("sk")).as("nd"))
        .orderBy("day_start")
    },

    // T40 — streaming windowed HEAVY HITTERS via the mergeable
    // Misra-Gries sketch: per-day top-5 users over the event stream
    // with O(capacity) state per window instead of a per-(day, user)
    // count shuffle — the "who dominates this window" signal a
    // 100-TB abuse/ops pipeline keeps continuously. Capacity 65536
    // holds the exact regime at the verified sfs (guarded — the
    // require trips, not lies, beyond it); oracle = exact per-day
    // top-5 under the same (count desc, user asc) total order.
    "t40_stream_heavy_hitters" -> withOracle(
      """WITH c AS (
        |  SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_start,
        |         user_id, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT day_start, user_id, cnt,
        |         ROW_NUMBER() OVER (PARTITION BY day_start
        |           ORDER BY cnt DESC, user_id) AS rn
        |  FROM c
        |)
        |SELECT day_start, user_id, CAST(cnt AS BIGINT) AS cnt
        |FROM r WHERE rn <= 5
        |ORDER BY day_start, cnt DESC, user_id""".stripMargin) { (s, dir) =>
      val guardedSize = udf { (n: Int) =>
        require(n < 65536,
          "t40_stream_heavy_hitters oracle is only valid in the Misra-Gries " +
            "exact regime (per-day distinct users < capacity); raise capacity")
        n
      }
      graft.streaming.StreamAnalytics.dailyTopUsersSketch(s, dir)
        .where(guardedSize(size(col("hh"))) >= 0)
        .select(col("day_start"), posexplode(col("hh")).as(Seq("pos", "e")))
        .where(col("pos") < 5)
        .select(col("day_start"), col("e.item").as("user_id"),
          col("e.count").as("cnt"))
        .orderBy(col("day_start"), col("cnt").desc, col("user_id"))
    },

    // T41 — streaming windowed QUANTILES via the mergeable quantile
    // sketch: per-day median event value from O(k) state per window —
    // closing the streaming sketch trio (t30 KMV distinct, t40 MG
    // heavy hitters, t41 quantiles). Values ride as exact
    // DECIMAL(18,2) cents; the sketch is exact while every item is
    // retained (guarded, the a4 pattern), so the oracle is plain
    // quantile_disc.
    "t41_stream_quantile" -> withOracle(
      """SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_start,
        |       CAST(quantile_disc(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0.5) AS BIGINT)
        |         AS median_cents
        |FROM events
        |GROUP BY 1
        |ORDER BY day_start""".stripMargin) { (s, dir) =>
      val medianUdf = udf { bytes: Array[Byte] =>
        val sk = graft.functions.KeySketch.deserialize(
          graft.functions.KeySketch.LongKind, bytes)
        require(sk.getN == sk.getNumRetained,
          "t41_stream_quantile oracle is only valid while the sketch retains " +
            "every item; raise k at bigger sfs")
        sk.getQuantile(0.5,
          org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
          .asInstanceOf[java.lang.Long].longValue()
      }
      graft.streaming.StreamAnalytics.dailyValueSketch(s, dir)
        .select(col("day_start"), medianUdf(col("sk")).as("median_cents"))
        .orderBy("day_start")
    },

    // T38 — STREAMING session windows: w4's sessionization as a
    // continuous query — the data-dependent MERGING window (sessions
    // extend/merge as events arrive; the watermark finalizes them).
    // Oracle: the same gap-split window replay w4 uses.
    "t38_stream_session" -> withOracle(
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tu, value FROM events
        |), marks AS (
        |  SELECT *, CASE WHEN tu - LAG(tu) OVER
        |                   (PARTITION BY user_id ORDER BY tu, event_id) > 1800000000
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |), sess AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tu, event_id
        |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marks
        |)
        |SELECT user_id, CAST(MIN(tu) AS BIGINT) AS session_start,
        |       CAST(MAX(tu) + 1800000000 AS BIGINT) AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      graft.streaming.StreamAnalytics.sessionRollup(s, dir)
        .orderBy("user_id", "session_start")
    },

    // T36 — STREAM-STATIC enrichment join: the events stream broadcast-
    // joined to the nation dim (user_id mod 25) inside each micro-batch
    // — no join state, the canonical streaming dimension-join shape —
    // then the watermarked per-day per-nation rollup. Oracle: the batch
    // join + GROUP BY.
    "t36_stream_enrich" -> withOracle(
      """SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_start,
        |       n.n_name,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
        |GROUP BY 1, 2
        |ORDER BY day_start, n_name""".stripMargin) { (s, dir) =>
      graft.streaming.StreamAnalytics.enrichedRollup(s, dir)
        .orderBy("day_start", "n_name")
    },

    // T34 — STREAM-STREAM interval join (attribution): views joined to
    // the same user's conversions within the next 30 minutes, both
    // sides watermarked with an event-time range condition so join
    // state stays bounded on an unbounded stream. The oracle is the
    // batch self-join with identical epoch-micros interval arithmetic.
    "t34_stream_join" -> withOracle(
      """WITH v AS (
        |  SELECT user_id, epoch_us(ts) AS tu
        |  FROM events WHERE event_type = 'view'
        |), c AS (
        |  SELECT user_id, epoch_us(ts) AS tu, value
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |)
        |SELECT v.user_id AS user_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM v JOIN c
        |  ON c.user_id = v.user_id
        | AND c.tu > v.tu AND c.tu <= v.tu + 1800000000
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.streaming.StreamAnalytics.viewConversionJoin(s, dir)
        .orderBy("user_id")
    },

    // T45 — stream-stream LEFT OUTER interval join: t34's pairing plus
    // the null-side rows for views whose 30-minute window expired
    // unmatched — emitted exactly once when BOTH sides' watermarks pass
    // the window (earlier would risk a wrong null against a late match).
    // A watermark-flush sentinel file closes the bounded drain so the
    // outer results are total; the oracle is the batch LEFT JOIN.
    "t45_stream_outer_join" -> withOracle(
      """WITH v AS (
        |  SELECT user_id, epoch_us(ts) AS tu
        |  FROM events WHERE event_type = 'view'
        |), c AS (
        |  SELECT user_id, epoch_us(ts) AS tu
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |)
        |SELECT v.user_id AS user_id,
        |       CAST(COUNT(c.user_id) AS BIGINT) AS matched,
        |       CAST(SUM(CASE WHEN c.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS unmatched
        |FROM v LEFT JOIN c
        |  ON c.user_id = v.user_id
        | AND c.tu > v.tu AND c.tu <= v.tu + 1800000000
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.streaming.StreamAnalytics.viewConversionOuterJoin(s, dir)
        .orderBy("user_id")
    },

    // T19 — streaming EXACT dedup with keyed state
    // (flatMapGroupsWithState): each distinct text's first micro-batch
    // emits its min-doc_id row; the state store carries seen-ness across
    // batches for the stream's lifetime (the continuously-running exact
    // form of the per-batch Bloom gate). The oracle is the batch
    // equivalent — min(doc_id) per text — which the deterministic
    // in-group min makes exactly reproducible.
    "t19_stream_dedup" -> withOracle(
      """SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, text
        |FROM documents
        |GROUP BY text
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.streaming.StreamAnalytics.streamDedupFirstOccurrence(s, dir)
        .orderBy("doc_id")
    },

    // X2 — SELECT-only SQL post-stage over registered table views
    // (reference: rust/query_sql/src/lib.rs:35-54). Routed through the
    // engine's gated SqlStage.
    "x2_sql_stage" -> withOracle(
      """SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |       CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY nation""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      graft.query.SqlStage.run(s,
        """SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
          |       CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
          |GROUP BY n.n_name
          |ORDER BY nation""".stripMargin)
    }
  )
}
