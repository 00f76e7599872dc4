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
