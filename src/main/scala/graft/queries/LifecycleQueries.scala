package graft.queries

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.core.{GraftField, GraftSchema, KeyRange, Region}
import graft.jobs.BasicCompactionStrategy
import graft.query.GraftQuery
import graft.table.{GraftTable, TableConfig}

/** Driver-checked queries that run the WHOLE table machinery — ingest
  * (S6/O2/M7), compaction strategy (M1/M2/T3), sketch-median partition
  * splitting (M3/M4/A4/A5), garbage collection (M5), region query
  * (P2/S1), and the DSv2 `spark.sql` surface with filter→region pushdown
  * — against an oracle that is a plain GROUP BY over the source parquet.
  * A correct end state is only reachable if every state transition
  * (add/replace/split/GC) is right, so one green row certifies the chain.
  */
object LifecycleQueries {

  import QueryDef._

  /** lineitem keyed by l_orderkey with continual sum(qty) aggregation. */
  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("l_orderkey", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("qty", LongType)))

  private val tableDirs = new ConcurrentHashMap[String, String]()

  /** Build (once per sf dir, cached for the JVM): create with coarse
    * split points → two ingest batches (every leaf gets 2+ files) →
    * basic-strategy compaction → sketch-median splitting → GC of the
    * replaced input files → the surviving table.
    */
  private def lifecycleTable(s: SparkSession, dir: String): GraftTable = {
    val tableDir = tableDirs.computeIfAbsent(dir, { _ =>
      val td = java.nio.file.Files.createTempDirectory("graft-lifecycle").toString
      val table = GraftTable.create(s, td, schema,
        splitPoints = Seq(15000L, 30000L, 45000L),
        config = TableConfig(
          aggregationConfig = "sum(qty)",
          splitThreshold = 4000L))
      val src = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      // two overlapping batches → every leaf holds multiple sorted runs
      table.ingest(src.filter(col("l_linenumber") <= 2))
      table.ingest(src.filter(col("l_linenumber") >= 3))
      table.compact(BasicCompactionStrategy())
      table.splitPartitions()
      table.collectGarbage(nowMs = System.currentTimeMillis() + 11L * 60 * 1000)
      td
    })
    GraftTable.load(s, tableDir)
  }

  private val trackedCompactions = new ConcurrentHashMap[String, (String, Long, Long)]()

  private val metricsDirs = new ConcurrentHashMap[String, String]()

  private val metricsExportDirs = new ConcurrentHashMap[String, String]()

  private val sqlCtasRoots = new ConcurrentHashMap[String, String]()

  private val sqlCloneRoots = new ConcurrentHashMap[String, String]()

  /** A6 fixture: one ingest into a 2-leaf table (no agg config), so every
    * state-store number the metrics read is exactly derivable from the
    * source rows.
    */
  private def metricsTable(s: SparkSession, dir: String): GraftTable = {
    val tableDir = metricsDirs.computeIfAbsent(dir, { _ =>
      val td = java.nio.file.Files.createTempDirectory("graft-metrics").toString
      // split point chosen inside the populated key range at every SF
      // (orderkeys start at 0), so both leaves get data and the COUNT-
      // DISTINCT bucket oracle equals the tree's leaf count
      val table = GraftTable.create(s, td, schema, splitPoints = Seq(700L))
      table.ingest(Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty")))
      // fold any salted ingest runs to one file per occupied leaf, so
      // the oracle's file_count/avg_refs prediction is sf-independent
      // (one compaction suffices: saltFor caps at compactionBatchSize)
      table.compactAll()
      td
    })
    GraftTable.load(s, tableDir)
  }

  private val jsonlDirs = new ConcurrentHashMap[String, String]()

  private val zorderDirs = new ConcurrentHashMap[String, String]()

  private val statsSkipDirs = new ConcurrentHashMap[String, String]()

  /** p7/o7 fixture: events keyed by event_id, ingested in four
    * user_id-quartile batches (each file gets a tight user_id range in
    * its sidecar stats).
    */
  private def statsSkipBuilder(s: SparkSession, dir: String): java.util.function.Function[String, String] = { _ =>
    val b = java.nio.file.Files.createTempDirectory("graft-statsskip").toString
    val rows = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val Seq(q1, q2, q3) = rows
      .agg(expr("percentile(user_id, array(0.25, 0.5, 0.75))"))
      .head().getSeq[Double](0).map(_.toLong)
    val schema = GraftSchema(
      rowKeys = Seq(GraftField("event_id", LongType)),
      sortKeys = Nil,
      values = Seq(
        GraftField("user_id", LongType),
        GraftField("event_type", org.apache.spark.sql.types.StringType)))
    val table = GraftTable.create(s, s"$b/table", schema)
    table.ingest(rows.filter(col("user_id") <= q1))
    table.ingest(rows.filter(col("user_id") > q1 && col("user_id") <= q2))
    table.ingest(rows.filter(col("user_id") > q2 && col("user_id") <= q3))
    table.ingest(rows.filter(col("user_id") > q3))
    b
  }

  private val strSkipDirs = new ConcurrentHashMap[String, String]()

  /** p8/p10 fixture: documents ingested per language, so every file's
    * sidecar carries a tight string min/max for lang.
    */
  private def strSkipBuilder(s: SparkSession, dir: String): java.util.function.Function[String, String] = { _ =>
    val b = java.nio.file.Files.createTempDirectory("graft-strskip").toString
    val rows = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"))
    val schema = GraftSchema(
      rowKeys = Seq(GraftField("doc_id", LongType)),
      sortKeys = Nil,
      values = Seq(
        GraftField("lang", org.apache.spark.sql.types.StringType),
        GraftField("n_chars", LongType)))
    val table = GraftTable.create(s, s"$b/table", schema)
    Seq("de", "en", "es", "fr", "zh").foreach(l =>
      table.ingest(rows.filter(col("lang") === l)))
    b
  }

  private val bloomSkipDirs = new ConcurrentHashMap[String, String]()

  private val leafSampleDirs = new ConcurrentHashMap[String, String]()

  private val reportDirs = new ConcurrentHashMap[String, String]()

  private val evolveDirs = new ConcurrentHashMap[String, String]()

  private val deleteDirs = new ConcurrentHashMap[String, String]()

  /** S10 fixture: (table dir, window start version, window end version). */
  private val cdcDirs = new ConcurrentHashMap[String, (String, Long, Long)]()

  private val upsertDirs = new ConcurrentHashMap[String, String]()

  private val reinsertDirs = new ConcurrentHashMap[String, String]()

  private val mergeDirs = new ConcurrentHashMap[String, String]()

  private val sqlDmlRoots = new ConcurrentHashMap[String, String]()

  private val sqlTravelRoots = new ConcurrentHashMap[String, (String, Long)]()

  private val sqlMetaRoots = new ConcurrentHashMap[String, String]()

  private val sqlEvolveRoots = new ConcurrentHashMap[String, String]()

  private val sqlPropsRoots = new ConcurrentHashMap[String, String]()

  private val cdfFeedDirs = new ConcurrentHashMap[String, String]()

  private val sqlOverwriteRoots = new ConcurrentHashMap[String, String]()

  private val restoreDirs = new ConcurrentHashMap[String, String]()

  private val sqlCallRoots = new ConcurrentHashMap[String, String]()

  private val sinkDirs = new ConcurrentHashMap[String, String]()

  private val mixedTopDirs = new ConcurrentHashMap[String, String]()

  private val cdcApplyDirs = new ConcurrentHashMap[String, String]()

  private val cloneDirs = new ConcurrentHashMap[String, String]()

  private val replicaDirs = new ConcurrentHashMap[String, String]()

  /** x10/x11 fixture: fixed 4-leaf table, two interleaved ingest batches
    * folded by compactAll (one file per leaf however the ingest salted),
    * GC'd — so every report number is derivable from the source rows.
    */
  private def reportTable(s: SparkSession, dir: String): GraftTable = {
    val base = reportDirs.computeIfAbsent(dir, { _ =>
      val b = java.nio.file.Files.createTempDirectory("graft-report").toString
      val table = GraftTable.create(s, s"$b/table", schema,
        splitPoints = Seq(3000L, 6000L, 9000L),
        config = TableConfig(splitThreshold = 2000L))
      val raw = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
      def batch(f: org.apache.spark.sql.Column) = raw.filter(f)
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      table.ingest(batch(col("l_linenumber") <= 2))
      table.ingest(batch(col("l_linenumber") >= 3))
      table.compactAll()
      table.collectGarbage(nowMs = System.currentTimeMillis() + 11L * 60 * 1000)
      b
    })
    // splitThreshold is deployment config (not state-store metadata,
    // like the reference's table properties) — reapply it on load
    GraftTable.load(s, s"$base/table",
      config = Some(TableConfig(splitThreshold = 2000L)))
  }

  private val streamingDirs = new ConcurrentHashMap[String, String]()

  /** T1 fixture: drop two halves of lineitem into an inbox as separate
    * files across two batcher cycles; the streaming sink lands them
    * through the normal ingest dataflow with idempotent batch commits.
    */
  private def streamingTable(s: SparkSession, dir: String): GraftTable = {
    val tableDir = streamingDirs.computeIfAbsent(dir, { _ =>
      val td = java.nio.file.Files.createTempDirectory("graft-streaming").toString
      val table = GraftTable.create(s, td, schema,
        splitPoints = Seq(20000L, 40000L),
        config = TableConfig(aggregationConfig = "sum(qty)"))
      val inbox = java.nio.file.Files.createTempDirectory("graft-inbox").toString
      val cp = java.nio.file.Files.createTempDirectory("graft-stream-cp").toString
      val ingest = new graft.streaming.StreamingIngest(table, inbox, cp)
      val src = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))

      def drop(name: String, batch: DataFrame): Unit = {
        val stage = java.nio.file.Files.createTempDirectory("graft-stage")
        batch.coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val it = java.nio.file.Files.list(stage).iterator()
        var part: java.nio.file.Path = null
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".parquet")) part = p
        }
        java.nio.file.Files.move(part, java.nio.file.Paths.get(inbox, name))
      }

      drop("batch-1.parquet", src.filter(col("l_linenumber") <= 2))
      require(ingest.runOnce() == 1, "first streaming cycle should dispatch one file")
      drop("batch-2.parquet", src.filter(col("l_linenumber") >= 3))
      require(ingest.runOnce() == 1, "second streaming cycle should dispatch one file")
      td
    })
    GraftTable.load(s, tableDir)
  }

  private val travelDirs = new ConcurrentHashMap[String, (String, Long)]()

  /** X7 fixture: ingest batch 1, capture the state-store version, ingest
    * batch 2 and compact — so the CURRENT state differs from the
    * captured version in tree shape, file set, and content, and only a
    * genuine historical read returns batch 1 alone.
    */
  private def travelTable(s: SparkSession, dir: String): (String, Long) =
    travelDirs.computeIfAbsent(dir, { _ =>
      val td = java.nio.file.Files.createTempDirectory("graft-travel").toString
      val table = GraftTable.create(s, td, schema,
        splitPoints = Seq(30000L),
        config = TableConfig(aggregationConfig = "sum(qty)"))
      val src = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      table.ingest(src.filter(col("l_linenumber") <= 2))
      val v = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
      table.ingest(src.filter(col("l_linenumber") >= 3))
      table.compactAll() // current state: merged files; v still sees batch 1's
      (td, v)
    })

  private val catalogRoots = new ConcurrentHashMap[String, String]()

  private val changesDirs = new ConcurrentHashMap[String, String]()

  private val incViewDirs = new ConcurrentHashMap[String, String]()

  /** X5 fixture: a table created, loaded, and queried through PURE SQL
    * via the TableCatalog (CREATE TABLE + INSERT INTO + SELECT) — no
    * Scala API anywhere in the path. The catalog NAME is derived from
    * the data dir: Spark caches catalog instances after first use, so
    * re-pointing one name's `root` at a different dir would silently
    * keep serving the old root.
    */
  private def catalogFor(s: SparkSession, dir: String): String = {
    val cat = s"graft_cat_${(dir.hashCode.toLong & 0xffffffffL).toHexString}"
    catalogRoots.computeIfAbsent(dir, { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft-cat-root").toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(
        s"""CREATE TABLE $cat.li (l_orderkey BIGINT, qty BIGINT NOT NULL)
           |USING graft
           |TBLPROPERTIES('rowKeys'='l_orderkey', 'splitPoints'='4000,8000',
           |              'aggregation'='sum(qty)')""".stripMargin)
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        .createOrReplaceTempView("li_src_x5")
      s.sql(s"INSERT INTO $cat.li SELECT * FROM li_src_x5")
      root
    })
    cat
  }

  private val coJoinDirs = new ConcurrentHashMap[String, String]()

  /** J7 fixture: two co-partitioned tables over the same split points —
    * left = lineitem keyed by l_orderkey with continual sum(qty), right
    * = 'F'-status orders keyed by o_orderkey (value o_custkey). Each
    * side ingests two overlapping batches so every leaf pair joins
    * genuine multi-run merge streams; the status filter leaves most
    * left keys unmatched, exercising the outer path for real.
    */
  private def coJoinTables(s: SparkSession, dir: String): (GraftTable, GraftTable) = {
    val base = coJoinDirs.computeIfAbsent(dir, { _ =>
      val b = java.nio.file.Files.createTempDirectory("graft-cojoin").toString
      val splits = Seq(400L, 2000L, 7000L)
      val lTable = GraftTable.create(s, s"$b/left", schema,
        splitPoints = splits, config = TableConfig(aggregationConfig = "sum(qty)"))
      val src = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      lTable.ingest(src.filter(col("l_linenumber") <= 2))
      lTable.ingest(src.filter(col("l_linenumber") >= 3))
      val rSchema = GraftSchema(
        rowKeys = Seq(GraftField("o_orderkey", LongType)),
        sortKeys = Nil,
        values = Seq(GraftField("o_custkey", LongType)))
      val rTable = GraftTable.create(s, s"$b/right", rSchema, splitPoints = splits)
      val osrc = Tables(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_custkey"))
      rTable.ingest(osrc.filter(col("o_orderkey") % 2 === 0))
      rTable.ingest(osrc.filter(col("o_orderkey") % 2 === 1))
      b
    })
    (GraftTable.load(s, s"$base/left"), GraftTable.load(s, s"$base/right"))
  }

  /** J8/J9 fixture: the j7 co-partitioned pair exposed through a
    * TableCatalog with storage-partitioned joins enabled, so PLAIN
    * `spark.sql` gets the shuffle-free leaf-aligned plan CoJoin proves
    * possible (VERDICT r14 #1). Returns the catalog name.
    */
  private def spjCatalog(s: SparkSession, dir: String): String = {
    coJoinTables(s, dir) // ensure the fixture tables exist
    val base = coJoinDirs.get(dir)
    val cat = s"spj_cat_${(base.hashCode.toLong & 0xffffffffL).toHexString}"
    if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", base)
    }
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    cat
  }

  private val columnMapDirs = new ConcurrentHashMap[String, String]()

  /** X23 fixture: qty ingested under its ORIGINAL name, renamed to
    * `quantity` (old files now served via alias), more data ingested
    * under the new name, then the scratch column dropped — with
    * in-fixture assertions that time travel still reads the historical
    * schemas and that retired names are rejected.
    */
  private def columnMapCatalog(s: SparkSession, dir: String): String = {
    val base = columnMapDirs.computeIfAbsent(dir, { _ =>
      val b = java.nio.file.Files.createTempDirectory("graft-colmap").toString
      val cat = s"cm_cat_${(b.hashCode.toLong & 0xffffffffL).toHexString}"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", b)
      s.sql(
        s"""CREATE TABLE $cat.cm (l_orderkey BIGINT, l_linenumber BIGINT,
           |  qty BIGINT, note STRING) USING graft
           |TBLPROPERTIES('rowKeys'='l_orderkey', 'sortKeys'='l_linenumber',
           |              'splitPoints'='1000,3000')""".stripMargin)
      Tables(s, dir, "lineitem").filter(col("l_orderkey") < 5000)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity").cast("long").as("qty"), lit("scratch").as("note"))
        .createOrReplaceTempView("cm_src_x23")
      s.sql(s"INSERT INTO $cat.cm SELECT * FROM cm_src_x23 WHERE l_linenumber <= 2")
      val preRename = graft.meta.JsonStateStore.load(s"$b/cm/meta").currentVersion
      s.sql(s"ALTER TABLE $cat.cm RENAME COLUMN qty TO quantity")
      s.sql(s"""INSERT INTO $cat.cm SELECT l_orderkey, l_linenumber, qty, note
               |FROM cm_src_x23 WHERE l_linenumber >= 3""".stripMargin)
      val preDrop = graft.meta.JsonStateStore.load(s"$b/cm/meta").currentVersion
      s.sql(s"ALTER TABLE $cat.cm DROP COLUMN note")
      // historical versions keep their historical schemas and data
      require(s.sql(s"SELECT count(qty) FROM $cat.cm VERSION AS OF $preRename")
        .head().getLong(0) > 0, "pre-rename version must still serve 'qty'")
      require(s.sql(
        s"SELECT count(*) FROM $cat.cm VERSION AS OF $preDrop WHERE note = 'scratch'")
        .head().getLong(0) > 0, "pre-drop version must still serve 'note'")
      // a dropped/renamed physical name can never be resurrected
      require(scala.util.Try(
        s.sql(s"ALTER TABLE $cat.cm ADD COLUMN note STRING")).isFailure,
        "retired column name must be rejected")
      b
    })
    s"cm_cat_${(base.hashCode.toLong & 0xffffffffL).toHexString}"
  }

  /** Prove `sql` executes exchange-free (no shuffle, no broadcast) with
    * the planner's broadcast escape hatch closed, then return it for the
    * oracle compare — the driver row carries its own plan assertion.
    */
  private def provenExchangeFree(s: SparkSession, sql: String, what: String): Unit = {
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> s.conf.getOption(k))
    saved.foreach { case (k, _) => s.conf.set(k, "-1") }
    try graft.query.Plans.requireExchangeFree(s.sql(sql), what)
    finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  val defs: Map[String, QueryDef] = Map(

    // J7 — SHUFFLE-FREE CO-PARTITIONED MERGE JOIN: two graft tables
    // sharing a partition tree join leaf-by-leaf as streaming sorted
    // merge joins — zero shuffle, zero sort (CoJoinSpec asserts the
    // lineage structurally). The 100-TB shape: joining two co-designed
    // fact tables without moving either across the network; Spark SPJ
    // cannot express range co-partitioning, hence the engine operator.
    "j7_colocated_join" -> withOracle(
      """SELECT l.l_orderkey, l.qty, o.o_custkey
        |FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |      FROM lineitem GROUP BY l_orderkey) l
        |JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F') o
        |  ON o.o_orderkey = l.l_orderkey
        |ORDER BY l.l_orderkey""".stripMargin) { (s, dir) =>
      val (lt, rt) = coJoinTables(s, dir)
      lt.coJoin(rt, "inner").orderBy("l_orderkey")
    },

    // J7 left-outer: unmatched left keys (non-'F' orders) survive with
    // a null right side.
    "j7_colocated_left" -> withOracle(
      """SELECT l.l_orderkey, l.qty, o.o_custkey
        |FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |      FROM lineitem GROUP BY l_orderkey) l
        |LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F') o
        |  ON o.o_orderkey = l.l_orderkey
        |ORDER BY l.l_orderkey""".stripMargin) { (s, dir) =>
      val (lt, rt) = coJoinTables(s, dir)
      lt.coJoin(rt, "left").orderBy("l_orderkey")
    },

    // J8 — STORAGE-PARTITIONED JOIN through PLAIN spark.sql: the same
    // co-partitioned pair as j7, but joined declaratively — the DSv2
    // scan reports KeyGroupedPartitioning over leaf ordinals via the
    // fingerprinted graft_leaf transform (GraftPartitioning), and
    // Spark's SPJ machinery plans a SortMergeJoin with ZERO exchanges
    // (asserted in-row with broadcast disabled: at 100 TB "it would
    // have broadcast" is not an excuse). Same oracle as j7.
    "j8_spj" -> withOracle(
      """SELECT l.l_orderkey, l.qty, o.o_custkey
        |FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |      FROM lineitem GROUP BY l_orderkey) l
        |JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F') o
        |  ON o.o_orderkey = l.l_orderkey
        |ORDER BY l.l_orderkey""".stripMargin) { (s, dir) =>
      val cat = spjCatalog(s, dir)
      val join = s"""SELECT l.l_orderkey, l.qty, o.o_custkey
                    |FROM $cat.left l JOIN $cat.right o ON l.l_orderkey = o.o_orderkey"""
        .stripMargin
      provenExchangeFree(s, join, "j8_spj")
      s.sql(s"$join ORDER BY l.l_orderkey")
    },

    // J9 — shuffle-free GROUP BY on the row key through plain SQL: the
    // scan's KeyGroupedPartitioning satisfies the aggregation's
    // ClusteredDistribution, so partial and final aggregate collapse
    // into the scan stage — no exchange (asserted in-row).
    "j9_spj_agg" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val cat = spjCatalog(s, dir)
      val agg = s"""SELECT l_orderkey, CAST(SUM(qty) AS BIGINT) AS total_qty
                   |FROM $cat.left GROUP BY l_orderkey""".stripMargin
      provenExchangeFree(s, agg, "j9_spj_agg")
      s.sql(s"$agg ORDER BY l_orderkey")
    },

    // X23 — COLUMN MAPPING (VERDICT r14 #5): RENAME COLUMN and DROP
    // COLUMN as pure-metadata operations on a table holding data across
    // the change — files written before the rename serve the column
    // under its old physical name through the alias seam, the dropped
    // column vanishes from the live schema without any rewrite, and the
    // in-row assertions prove the historical versions still read with
    // their historical schemas (time travel). Oracle: the same rows
    // reconstructed from lineitem under the FINAL schema.
    "x23_sql_drop_column" -> withOracle(
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS quantity
        |FROM lineitem
        |WHERE l_orderkey < 5000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val cat = columnMapCatalog(s, dir)
      s.sql(s"""SELECT l_orderkey, l_linenumber, quantity FROM $cat.cm
               |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    },

    // X5 — pure-SQL table lifecycle through the TableCatalog: DDL with
    // key/config properties, INSERT INTO running the full ingest
    // dataflow, SELECT with region pushdown and the continual sum(qty)
    // aggregation view — against the same plain GROUP BY oracle.
    "x5_catalog_sql" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey >= 3000 AND l_orderkey < 9000
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val cat = catalogFor(s, dir)
      s.sql(
        s"""SELECT l_orderkey, qty FROM $cat.li
           |WHERE l_orderkey >= 3000 AND l_orderkey < 9000
           |ORDER BY l_orderkey""".stripMargin)
    },

    // M2 — the full LSM lifecycle, read back through a region query.
    "m2_lifecycle" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey >= 10000 AND l_orderkey < 40000
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val table = lifecycleTable(s, dir)
      table.query(GraftQuery.forRegions(
          Region(KeyRange.minMax("l_orderkey", 10000L, 40000L))))
        .orderBy("l_orderkey")
    },

    // O6 — KEYSET PAGINATION (the serving-tier page-fetch pattern):
    // each page is "key strictly after the previous page's last key,
    // first 100 in key order", fetched through the DSv2 surface where
    // the filter pushes down to a pruned key-range region and the
    // key-ordered LIMIT caps every partition's read at page size — so
    // page N costs the same as page 1, unlike OFFSET, which re-scans
    // and discards N×pageSize rows (the classic deep-pagination
    // scale-killer). Each page IS a driver fetch, as a real serving
    // client would issue it. Oracle: the ranked window sliced into the
    // same 3 pages.
    "o6_keyset_pages" -> withOracle(
      """SELECT CAST((rn - 1) // 100 + 1 AS BIGINT) AS page, l_orderkey, qty
        |FROM (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |         ROW_NUMBER() OVER (ORDER BY l_orderkey) AS rn
        |  FROM lineitem GROUP BY l_orderkey)
        |WHERE rn <= 300
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val table = lifecycleTable(s, dir)
      val pageSize = 100
      val view = s.read.format("graft").load(table.dir)
      var after: Option[Long] = None
      val rows = (1 to 3).flatMap { p =>
        val page = after.fold(view)(k => view.filter(col("l_orderkey") > k))
          .orderBy("l_orderkey").limit(pageSize)
          .collect()
        require(page.nonEmpty, s"page $p came back empty")
        after = Some(page.last.getLong(0))
        page.map(r => (p.toLong, r.getLong(0), r.getLong(1)))
      }
      import s.implicits._
      rows.toDF("page", "l_orderkey", "qty").orderBy("l_orderkey")
    },

    // M8 — bulk export: the whole table to parquet (each leaf in
    // parallel through the same merge path queries use), read back and
    // compared against the plain GROUP BY the table materializes.
    "m8_export" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val table = lifecycleTable(s, dir)
      val out = java.nio.file.Files.createTempDirectory("graft-export").toString
      table.export(out)
      s.read.parquet(out).orderBy("l_orderkey")
    },

    // M12 — JSONL shard export: the training-data handoff format (one
    // JSON object per line, fixed shard count, key-hash shard
    // assignment so re-exports are deterministic). The oracle reads the
    // exported shards back against the table schema — a row survives
    // the JSON round trip only if types and values do.
    "m12_jsonl_export" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val table = lifecycleTable(s, dir)
      val out = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
      table.exportJsonl(out, shards = 8)
      s.read.schema(table.schema.toStructType).json(s"$out/*.json")
        .orderBy("l_orderkey")
    },

    // X12 — version-keyed query result cache: the same query against an
    // unchanged table is served from the cache directory (results at a
    // state version are immutable; any mutation bumps the version and
    // invalidates naturally). Asserts the second call IS a cache hit;
    // the oracle checks the served result against ground truth.
    "x12_cached_query" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey >= 5000 AND l_orderkey < 9000
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val table = lifecycleTable(s, dir)
      val cacheDir = java.nio.file.Files.createTempDirectory("graft-qcache").toString
      val q = GraftQuery.forRegions(
        Region(KeyRange.minMax("l_orderkey", 5000L, 9000L)))
      val (_, hit1) = table.queryCached(q, cacheDir)
      val (df, hit2) = table.queryCached(q, cacheDir)
      require(!hit1 && hit2,
        s"expected miss-then-hit from the version-keyed cache, got ($hit1, $hit2)")
      df.orderBy("l_orderkey")
    },

    // M9 — Arrow FFI export (S4): every partition streams to its own
    // Arrow IPC file via the Arrow Java API — no shuffle, no driver
    // collect; the row reports the manifest's total (the oracle's
    // COUNT(*)), and ArrowExportSpec proves content round-trips
    // bit-for-bit through the IPC format, nulls included.
    "m9_arrow_export" -> withOracle(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem""") { (s, dir) =>
      import s.implicits._
      val out = java.nio.file.Files.createTempDirectory("graft-arrow").toString
      try {
        val manifest = graft.query.ArrowExport
          .exportArrow(Tables(s, dir, "lineitem"), out)
        Seq(manifest.map(_._2).sum).toDF("n_rows")
      } finally graft.meta.GraftFS.deleteRecursive(out)
    },

    // X1 — config-string transform at query time over the lifecycle
    // table: a CapValue{qty,77} transform caps the aggregated quantity,
    // reproduced in the oracle as LEAST over the same grouping. The
    // region sits inside the populated key range at every sf (orderkeys
    // stop near 15000·sf/0.01) and per-key sums reach ~200, so the cap
    // genuinely rewrites values — a region above the key range would
    // pass vacuously on zero rows.
    "x1_transform" -> withOracle(
      """SELECT l_orderkey,
        |       CAST(LEAST(SUM(CAST(l_quantity AS BIGINT)), 77) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey >= 2000 AND l_orderkey < 3000
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val table = lifecycleTable(s, dir)
      table.query(graft.query.GraftQuery(
          regions = Seq(Region(KeyRange.minMax("l_orderkey", 2000L, 3000L))),
          queryTransformConfig = Some("graft.transforms.CapValue{qty,77}")))
        .orderBy("l_orderkey")
    },

    // X6 — query status tracking: a region query runs through
    // TrackedQueryExecutor; the emitted row is the tracker's record
    // (state machine mirroring the reference's QueryState enum), and the
    // oracle recomputes the tracked row count from the source rows —
    // COUNT(DISTINCT key) in the region, since the table aggregates
    // per key.
    "x6_query_tracker" -> withOracle(
      """SELECT 'q-track' AS query_id, 'COMPLETED' AS state,
        |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS row_cnt
        |FROM lineitem
        |WHERE l_orderkey >= 10000 AND l_orderkey < 20000""".stripMargin) { (s, dir) =>
      val table = lifecycleTable(s, dir)
      val ex = new graft.query.TrackedQueryExecutor(table)
      ex.run("q-track", GraftQuery.forRegions(
        Region(KeyRange.minMax("l_orderkey", 10000L, 20000L))))
      val t = ex.tracker.get("q-track").get
      import s.implicits._
      Seq((t.queryId, t.state.name, t.rowCount.get))
        .toDF("query_id", "state", "row_cnt")
    },

    // X9 — compaction job tracker: a fresh table (4 fixed-width leaves,
    // two interleaved ingest batches) compacted whole-table under an
    // InMemoryCompactionJobTracker; the row aggregates the TRACKED
    // lifecycle — every per-leaf job COMMITTED, job count = leaves
    // holding data, rows written = every ingested row (no aggregation
    // configured). The oracle recomputes leaf occupancy and row count
    // from lineitem directly, so the tracker's numbers are checked
    // against ground truth, not against the engine's own metrics.
    "x9_compaction_tracker" -> withOracle(
      """SELECT 'COMMITTED' AS state,
        |  CAST(COUNT(DISTINCT CASE WHEN l_orderkey < 3000 THEN 0
        |                           WHEN l_orderkey < 6000 THEN 1
        |                           WHEN l_orderkey < 9000 THEN 2
        |                           ELSE 3 END) AS BIGINT) AS jobs,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem WHERE l_orderkey < 12000""".stripMargin) { (s, dir) =>
      import s.implicits._
      val (state, jobs, rows) = trackedCompactions.computeIfAbsent(dir, { _ =>
        val td = java.nio.file.Files.createTempDirectory("graft-ctrack-q").toString
        val table = GraftTable.create(s, td, schema,
          splitPoints = Seq(3000L, 6000L, 9000L))
        val src = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        table.ingest(src.filter(col("l_linenumber") <= 2))
        table.ingest(src.filter(col("l_linenumber") >= 3))
        val tracker = new graft.jobs.InMemoryCompactionJobTracker
        table.compactAll(tracker)
        val jobs = tracker.all
        val allCommitted = jobs.nonEmpty &&
          jobs.forall(_.state == graft.jobs.CompactionJobState.Committed) &&
          tracker.unfinished.isEmpty
        (if (allCommitted) "COMMITTED" else "NOT_COMMITTED",
          jobs.size.toLong, jobs.flatMap(_.rowsWritten).sum)
      })
      Seq((state, jobs, rows)).toDF("state", "jobs", "n_rows")
    },

    // X7 — time travel: the table read back AS OF the version captured
    // after the first ingest. Batch 2 and a compaction have rewritten
    // the current state since, so the oracle (batch 1's rows alone)
    // passes only if the historical tree + file references drive the
    // read. Mirrors the reference's transaction-log snapshot history.
    "x7_time_travel" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_linenumber <= 2
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val (td, v) = travelTable(s, dir)
      GraftTable.loadAsOf(s, td, v).toDF.orderBy("l_orderkey")
    },

    // S7 — table-changes stream (readStream on a graft table): drain 1
    // checkpoints after batch 1 (snapshot initial load); between drains,
    // batch 2 lands AND is compacted away, then batch 3 lands — so
    // drain 2 exercises the incremental version walk: it must pick the
    // mid-window batch-2 files (gone from both endpoint snapshots — else
    // keys vanish) while skipping the compaction output (else sums
    // double). The emitted frame aggregates everything both drains
    // delivered into a durable (parquet) sink; the oracle is the plain
    // GROUP BY over all three batches.
    "s7_table_changes" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      // memoized per JVM like the other lifecycle fixtures: the build
      // (ingests + compaction + two stream drains) runs once, re-runs
      // re-read the drained output
      val out = changesDirs.computeIfAbsent(dir, { _ =>
        val td = java.nio.file.Files.createTempDirectory("graft-changes").toString
        val cp = java.nio.file.Files.createTempDirectory("graft-changes-cp").toString
        val o = java.nio.file.Files.createTempDirectory("graft-changes-out").toString
        graft.streaming.StreamTuning.tune(s, Some(cp))
        val table = GraftTable.create(s, td, schema, splitPoints = Seq(7000L))
        val src = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        def drain(): Unit = {
          val q = s.readStream.format("graft").load(td)
            .writeStream.format("parquet")
            .option("path", o).option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        table.ingest(src.filter(col("l_linenumber") === 1))
        drain()
        table.ingest(src.filter(col("l_linenumber") === 2))
        table.compactAll() // consumes batch 2's files mid-window
        table.ingest(src.filter(col("l_linenumber") >= 3))
        drain()
        o
      })
      s.read.parquet(out)
        .groupBy("l_orderkey").agg(sum(col("qty")).as("qty"))
        .orderBy("l_orderkey")
    },

    // S8 — INCREMENTAL MATERIALIZED VIEW: a derived rollup table
    // maintained from the source table's CHANGES stream. Each
    // micro-batch of appended rows reduces to map-side partial sums and
    // ingests them — with the engine's idempotent (queryId, batchId)
    // txn, so a foreachBatch replay cannot double-count — into a
    // derived table whose continual aggregation (T3) completes the
    // rollup at read/compaction time. The subscriber resumes from its
    // checkpoint across maintenance runs (batch 2 arrives after the
    // first drain finished), so the view never rescans the source: at
    // 100 TB the maintenance cost is O(changes), not O(table). Oracle:
    // the full GROUP BY the view must equal after both batches.
    "s8_incremental_view" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_linenumber <= 2
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val derivedDir = incViewDirs.computeIfAbsent(dir, { _ =>
        val td = java.nio.file.Files.createTempDirectory("graft-iv-src").toString
        val dd = java.nio.file.Files.createTempDirectory("graft-iv-view").toString
        val cp = java.nio.file.Files.createTempDirectory("graft-iv-cp").toString
        graft.streaming.StreamTuning.tune(s, Some(cp))
        val src = GraftTable.create(s, td, schema, splitPoints = Seq(7000L))
        GraftTable.create(s, dd, schema, splitPoints = Seq(7000L),
          config = TableConfig(aggregationConfig = "sum(qty)"))
        val rows = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("qty"))
        def maintain(): Unit = {
          val q = s.readStream.format("graft").load(td)
            .writeStream
            .foreachBatch { (batch: DataFrame, batchId: Long) =>
              val partial = batch.groupBy("l_orderkey")
                .agg(sum(col("qty")).as("qty"))
              GraftTable.load(s, dd)
                .ingest(partial, txn = Some(("s8-view", batchId)))
              ()
            }
            .option("checkpointLocation", cp)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        src.ingest(rows.filter(col("l_linenumber") === 1)
          .select("l_orderkey", "qty"))
        maintain()
        src.ingest(rows.filter(col("l_linenumber") === 2)
          .select("l_orderkey", "qty"))
        maintain()
        dd
      })
      GraftTable.load(s, derivedDir).toDF.orderBy("l_orderkey")
    },

    // X8 — results publishing (the reference's serving-tier S5 surface):
    // a tracked region query pushes its rows as JSON batch messages onto
    // a queue (executor-side foreachPartition — the driver never sees a
    // row), then the emitted frame is the messages parsed BACK into rows
    // — so the oracle passes only if the whole publish path (batching,
    // JSON serialization, accumulator count, tracker completion) is
    // lossless. A file (parquet) output and the in-memory queue share
    // the same ResultsOutput contract.
    "x8_results_output" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey >= 8000 AND l_orderkey < 14000
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val table = lifecycleTable(s, dir)
      val qname = s"x8-${java.util.UUID.randomUUID()}"
      val ex = new graft.query.TrackedQueryExecutor(table)
      val info = ex.publish("q-x8",
        GraftQuery.forRegions(Region(KeyRange.minMax("l_orderkey", 8000L, 14000L))),
        new graft.query.QueueResultsOutput(new graft.query.InMemoryResultsQueue(qname),
          batchSize = 200))
      require(info.error.isEmpty, s"publish failed: ${info.error}")
      require(ex.stateOf("q-x8").contains(graft.query.QueryState.Completed))
      val msgs = graft.query.InMemoryResultsQueue.drain(qname)
      require(msgs.nonEmpty, "no result messages published")
      import s.implicits._
      s.read.json(s.createDataset(msgs))
        .select(explode(col("rows")).as("r"))
        .select(col("r.l_orderkey").as("l_orderkey"), col("r.qty").as("qty"))
        .orderBy("l_orderkey")
    },

    // A6 — table metrics computed from the state store ALONE (no data
    // read), checked against COUNT-based truths DuckDB derives from the
    // source rows: one ingest into a 2-leaf table writes one file per
    // non-empty leaf with exact footer row counts, so fileCount /
    // rowCount / partitionCount(=2*leaves-1) / leafCount / avg refs are
    // all data-derivable.
    // M17 — metrics export seam (the reference's CloudWatch TableMetrics
    // publisher as a graft-native time series): two published snapshots
    // of a source table land in a metrics TABLE keyed by (table_name,
    // ts), queryable like any other data. The source's layout is made
    // oracle-predictable the same way as a6: split at 700, compactAll
    // after each ingest folds each occupied leaf to one file.
    "m17_metrics_export" -> withOracle(
      """WITH base AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(COUNT(DISTINCT CASE WHEN l_orderkey < 700 THEN 0 ELSE 1 END) AS BIGINT) AS nb
        |  FROM lineitem)
        |SELECT 'src' AS table_name, CAST(1000 AS BIGINT) AS ts,
        |       nb AS file_count, n AS row_count,
        |       CAST(2 * nb - 1 AS BIGINT) AS partition_count,
        |       nb AS leaf_partition_count,
        |       nb AS file_references, nb AS partitions_with_files
        |FROM base
        |UNION ALL
        |SELECT 'src', CAST(2000 AS BIGINT),
        |       nb, CAST(2 * n AS BIGINT), CAST(2 * nb - 1 AS BIGINT), nb, nb, nb
        |FROM base
        |ORDER BY ts""".stripMargin) { (s, dir) =>
      val base = metricsExportDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-metricsx").toString
        val src = GraftTable.create(s, s"$b/src", schema, splitPoints = Seq(700L))
        val sink = graft.jobs.MetricsPublisher.createTable(s, s"$b/metrics")
        val rows = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        src.ingest(rows); src.compactAll()
        graft.jobs.MetricsPublisher.publish(src, sink, "src", nowMs = 1000L)
        src.ingest(rows); src.compactAll()
        graft.jobs.MetricsPublisher.publish(src, sink, "src", nowMs = 2000L)
        b
      })
      GraftTable.load(s, s"$base/metrics").toDF.orderBy("ts")
    },

    "a6_metrics" -> withOracle(
      """SELECT CAST(COUNT(DISTINCT CASE WHEN l_orderkey < 700 THEN 0 ELSE 1 END) AS BIGINT) AS file_count,
        |       CAST(COUNT(*) AS BIGINT) AS row_count,
        |       CAST(2 * COUNT(DISTINCT CASE WHEN l_orderkey < 700 THEN 0 ELSE 1 END) - 1 AS BIGINT) AS partition_count,
        |       CAST(COUNT(DISTINCT CASE WHEN l_orderkey < 700 THEN 0 ELSE 1 END) AS BIGINT) AS leaf_count,
        |       CAST(1.0 AS DOUBLE) AS avg_refs
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val table = metricsTable(s, dir)
      val m = table.metrics
      import s.implicits._
      Seq((m.fileCount.toLong, m.rowCount, m.partitionCount.toLong,
        m.leafPartitionCount.toLong, m.averageFileReferencesPerPartition))
        .toDF("file_count", "row_count", "partition_count", "leaf_count", "avg_refs")
    },

    // S9 — SUM aggregate pushdown: SELECT SUM(value), SUM(key), COUNT(*)
    // over the DSv2 table answers from METADATA alone (per-file sidecar
    // sums written at ingest AND carried one-pass through compaction +
    // state-store footer counts) — zero data files read. The row itself
    // asserts the plan is the metadata-only scan, so a silent fallback
    // to a real scan fails the row rather than hiding as a perf loss.
    "s9_sum_pushdown" -> withOracle(
      """SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        |       CAST(SUM(l_orderkey) AS BIGINT) AS total_key,
        |       CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
        |       CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val table = metricsTable(s, dir)
      val agg = s.read.format("graft").load(table.dir)
        .agg(sum(col("qty")).as("total_qty"),
          sum(col("l_orderkey")).as("total_key"),
          min(col("qty")).as("min_qty"),
          max(col("qty")).as("max_qty"),
          count(lit(1)).as("n"))
      val scan = agg.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.scan
      }.head
      require(scan.isInstanceOf[graft.sources.GraftMetaAggScan],
        s"SUM/COUNT did not push to metadata: ${scan.getClass}")
      agg
    },

    // P6 — Z-ORDER multi-dimensional layout: events keyed by the Morton
    // interleave of (user_id, day) land in the engine's normal sorted
    // table, and a 2-d box query decomposes into contiguous z ranges
    // (graft.core.ZOrder.ranges) that ride the existing leaf-pruned
    // region scan — pruning on BOTH dimensions of a key-sorted store,
    // the layout move a 100-TB multi-dim workload needs (a box covering
    // p% of each dimension touches ~p²-ish of the files instead of all
    // of them). The query ASSERTS leaf pruning actually happened, so a
    // layout regression fails correctness rather than just perf; the
    // residual box filter makes over-cover from the range budget
    // harmless. Oracle: the plain box filter over raw events.
    "p6_zorder" -> withOracle(
      """SELECT event_id, user_id,
        |       CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
        |       event_type
        |FROM events
        |WHERE user_id >= 10 AND user_id < 100
        |  AND epoch_us(ts) // 86400000000 >= 19730
        |  AND epoch_us(ts) // 86400000000 < 19740
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = zorderDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-zorder").toString
        // ts is normalized to epoch-nanos long by Tables; day = nanos/86.4e12
        val rows = Tables(s, dir, "events").select(
          graft.core.ZOrder.zvalue(col("user_id"), expr("ts DIV 86400000000000")).as("z"),
          col("event_id"), col("user_id"),
          expr("ts DIV 86400000000000").as("day"), col("event_type"))
        // 8 leaves at exact z octiles — enough structure for the prune
        // assertion to have teeth at every verified sf
        val splits = rows.agg(expr(
            "percentile(z, array(0.125,0.25,0.375,0.5,0.625,0.75,0.875))"))
          .head().getSeq[Double](0).map(_.toLong).distinct.sorted
        val schema = GraftSchema(
          rowKeys = Seq(GraftField("z", LongType)),
          sortKeys = Seq(GraftField("event_id", LongType)),
          values = Seq(
            GraftField("user_id", LongType),
            GraftField("day", LongType),
            GraftField("event_type", org.apache.spark.sql.types.StringType)))
        val table = GraftTable.create(s, s"$b/table", schema, splitPoints = splits)
        table.ingest(rows)
        b
      })
      val table = GraftTable.load(s, s"$base/table")
      val rs = graft.core.ZOrder.ranges(10, 99, 19730, 19739, bits = 16, maxRanges = 32)
      val regions = rs.map { case (lo, hi) =>
        Region(KeyRange.minMax("z", lo, hi + 1)) }
      val tree = table.store.partitionTree
      val touched = tree.leavesOverlapping(regions).size
      require(touched < tree.leaves.size,
        s"z-order stopped pruning: $touched/${tree.leaves.size} leaves touched")
      table.query(GraftQuery(regions = regions))
        .filter(col("user_id") >= 10 && col("user_id") < 100 &&
          col("day") >= 19730 && col("day") < 19740)
        .select("event_id", "user_id", "day", "event_type")
        .orderBy("event_id")
    },

    // M10 — JSONL ingest (the LLM-pipeline interchange format): the
    // documents table serializes to JSON-lines, reads back through
    // spark.read.json with an explicit schema (no driver-side inference
    // scan), ingests through the normal sorted-run dataflow into a
    // keyed table, and reads back via the engine — proving the S6
    // source seam accepts any Spark-readable format, not just parquet.
    // P7 — file-grain data skipping on a NON-key column: events keyed
    // by event_id ingest in four user_id-quartile batches (the sharded-
    // upstream shape — each shard's file carries a tight user_id range
    // in its sidecar stats), then a pushed `user_id < 3` predicate
    // drops every file whose exact min/max excludes it BEFORE any data
    // IO. Region pruning can't help here (the predicate is not on the
    // key); this is the Iceberg/Delta min-max manifest move on the
    // engine's own metadata — at 100 TB a selective non-key predicate
    // over range-correlated ingest reads ~1/shards of the files. The
    // query ASSERTS files were skipped, so a stats regression fails
    // correctness, not just perf. Oracle: the plain filter over events.
    "p7_stats_skipping" -> withOracle(
      """SELECT event_id, user_id, event_type
        |FROM events WHERE user_id < 3
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = statsSkipDirs.computeIfAbsent(dir, statsSkipBuilder(s, dir))
      val df = s.read.format("graft").load(s"$base/table")
        .filter(col("user_id") < 3)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
      val desc = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.description()
      }.head
      val skippedFiles = "statsSkippedFiles=(\\d+)".r.findFirstMatchIn(desc)
        .map(_.group(1).toInt).getOrElse(-1)
      require(skippedFiles >= 2,
        s"stats skipping stopped pruning files: $desc")
      df
    },

    // P8 — the CATEGORICAL data-skipping shape: documents keyed by
    // doc_id ingest in per-language batches (the per-source/per-shard
    // upstream layout), so each file's sidecar carries a tight string
    // min/max for lang; a pushed `lang = 'de'` then drops every other
    // language's files before any data IO — `WHERE lang = 'en'` over a
    // partition-less 100-TB corpus is THE predicate this pays for.
    // Asserts file pruning like p6/p7; oracle = the plain filter.
    "p8_string_skip" -> withOracle(
      """SELECT doc_id, lang, n_chars
        |FROM documents WHERE lang = 'de'
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val base = strSkipDirs.computeIfAbsent(dir, strSkipBuilder(s, dir))
      val df = s.read.format("graft").load(s"$base/table")
        .filter(col("lang") === "de")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
      val desc = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.description()
      }.head
      val skippedFiles = "statsSkippedFiles=(\\d+)".r.findFirstMatchIn(desc)
        .map(_.group(1).toInt).getOrElse(-1)
      require(skippedFiles >= 3,
        s"string stats skipping stopped pruning files: $desc")
      df
    },

    // P10 — PREFIX file-skipping: a pushed `lang LIKE 'e%'` maps to the
    // byte range [prefix, succ(prefix)) against each file's string
    // min/max sidecar stats — the categorical-prefix shape users
    // actually write ("en*" locales, "img/" keys, date-string prefixes)
    // — so over the per-language files only en/es survive and de/fr/zh
    // are dropped before any data IO. Same fixture as p8; asserts the
    // prune structurally; oracle: the plain LIKE filter.
    "p10_prefix_skip" -> withOracle(
      """SELECT doc_id, lang, n_chars
        |FROM documents WHERE lang LIKE 'e%'
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val base = strSkipDirs.computeIfAbsent(dir, strSkipBuilder(s, dir))
      val df = s.read.format("graft").load(s"$base/table")
        .filter(col("lang").startsWith("e"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
      val desc = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.description()
      }.head
      val skippedFiles = "statsSkippedFiles=(\\d+)".r.findFirstMatchIn(desc)
        .map(_.group(1).toInt).getOrElse(-1)
      require(skippedFiles >= 3,
        s"prefix stats skipping stopped pruning files: $desc")
      df
    },

    // P9 — Bloom value-index skipping: equality on a value column whose
    // per-file min/max RANGES all straddle the probe ('purchase' sits
    // inside [click,view] and [error,signup]) — only the per-file Bloom
    // filter (indexConfig = "bloom(event_type)", built by BOTH write
    // paths) can prune. The 100-TB shape: "find rows with this label"
    // on an unsorted categorical touches the files that contain it, not
    // every file the min/max range check keeps. Asserts the bloom prune
    // structurally (the p7/p8 pattern); oracle: plain filter.
    "p9_bloom_skip" -> withOracle(
      """SELECT event_id, event_type
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = bloomSkipDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-bloomskip").toString
        val rows = Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"))
        val schema = GraftSchema(
          rowKeys = Seq(GraftField("event_id", LongType)),
          sortKeys = Nil,
          values = Seq(
            GraftField("user_id", LongType),
            GraftField("event_type", org.apache.spark.sql.types.StringType)))
        val table = GraftTable.create(s, s"$b/table", schema,
          config = TableConfig(indexConfig = "bloom(event_type)"))
        // each batch's type SET is disjoint but its min/max RANGE
        // straddles 'purchase' — min/max keeps every file
        Seq(Seq("click", "view"), Seq("error", "signup"), Seq("purchase"))
          .foreach(ts => table.ingest(rows.filter(col("event_type").isin(ts: _*))))
        b
      })
      val df = s.read.format("graft").load(s"$base/table")
        .filter(col("event_type") === "purchase")
        .select("event_id", "event_type")
        .orderBy("event_id")
      val desc = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.description()
      }.head
      val skippedFiles = "bloomSkippedFiles=(\\d+)".r.findFirstMatchIn(desc)
        .map(_.group(1).toInt).getOrElse(-1)
      require(skippedFiles >= 2,
        s"bloom value-index skipping stopped pruning files: $desc")
      df
    },

    // O8 — deterministic leaf sampling for fast estimates: read every
    // 2nd leaf (key order) through the region-pruned query path — the
    // scan touches only those leaves' files — and scale the sampled SUM
    // by the metadata-exact row fraction. The 100-TB shape: "average/
    // total to ±ε" from 1/k of the IO, repeatable (same call = same
    // rows, no RNG), with the scale-up factor from committed footer
    // counts instead of a COUNT(*) pass. Oracle recomputes the same
    // fixed key ranges (split points 3000/6000/9000, leaves 0 and 2).
    "o8_leaf_sample" -> withOracle(
      """WITH src AS (
        |  SELECT l_orderkey AS k, CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem WHERE l_orderkey < 12000
        |), s AS (
        |  SELECT SUM(q) AS sq, COUNT(*) AS sc
        |  FROM src WHERE k < 3000 OR (k >= 6000 AND k < 9000)
        |), t AS (SELECT COUNT(*) AS tc FROM src)
        |SELECT CAST(s.sc AS BIGINT) AS sampled_rows,
        |       CAST(t.tc AS BIGINT) AS total_rows,
        |       s.sq * 1.0 * t.tc / s.sc AS est_sum
        |FROM s, t""".stripMargin) { (s, dir) =>
      val base = leafSampleDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-leafsample").toString
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(3000L, 6000L, 9000L))
        table.ingest(Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty")))
        b
      })
      val table = GraftTable.load(s, s"$base/table")
      val frac = table.leafSampleFraction(2, 0)
      val totalRows = math.round(
        // metadata-exact total: sampledRows / fraction
        table.leafSample(2, 0).count() / frac)
      table.leafSample(2, 0)
        .agg(sum(col("qty")).as("sq"), count(lit(1)).as("sc"))
        .select(col("sc").as("sampled_rows"),
          lit(totalRows).as("total_rows"),
          (col("sq").cast("double") * lit(totalRows.toDouble) /
            col("sc").cast("double")).as("est_sum"))
    },

    // X10 — partitions status report as a queryable relation (reference:
    // PartitionsStatusReport): per-leaf key range, file/row counts and
    // the needs-split flag, read from state-store METADATA only — no
    // data IO, the property that makes it safe against a 100-TB table.
    // The oracle recomputes every number from the source rows (leaf
    // ranges fixed by the create-time split points; n_files=1 because
    // compactAll folds each leaf; rows/threshold from COUNT).
    "x10_partitions_report" -> withOracle(
      """SELECT CASE WHEN l_orderkey < 3000 THEN '-inf'
        |            WHEN l_orderkey < 6000 THEN '3000'
        |            WHEN l_orderkey < 9000 THEN '6000'
        |            ELSE '9000' END AS leaf_key,
        |       CAST(1 AS BIGINT) AS n_files,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       COUNT(*) > 2000 AS needs_split
        |FROM lineitem WHERE l_orderkey < 12000
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.reports.StatusReports.partitionsStatusDF(reportTable(s, dir))
        .orderBy("leaf_key")
    },

    // X11 — files status report as a one-row relation (reference:
    // FilesStatusReport / StandardFileStatusReporter's header numbers):
    // partition/file/reference/row totals plus the GC backlog, all from
    // metadata. After compactAll+GC the fixture's numbers are exactly
    // derivable: 4 leaves, 3 internal nodes, one file per leaf, empty
    // GC queue, rows = COUNT of the source rows.
    // M13 — row-key deletes (takedown requests): keys divisible by 7
    // tombstoned AFTER ingest — O(keys) metadata, no data rewrite. The
    // fixture checks BOTH phases against the same expectation: the
    // pending-tombstone read (streaming merge-anti-join in every
    // reader) must equal the post-compactAll read (physical purge +
    // atomic tombstone retirement); the emitted frame is the purged
    // table. The reference has no delete at all (ageOff only).
    "m13_delete_keys" -> withOracle(
      """SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey < 12000 AND l_orderkey % 7 <> 0
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val base = deleteDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-delete-q").toString
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(3000L, 6000L, 9000L))
        val raw = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
        def batch(f: org.apache.spark.sql.Column) = raw.filter(f)
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        table.ingest(batch(col("l_linenumber") <= 2))
        table.ingest(batch(col("l_linenumber") >= 3))
        table.deleteKeys(raw.select(col("l_orderkey"))
          .filter(col("l_orderkey") % 7 === 0).distinct())
        val pending = s.read.format("graft").load(s"$b/table").count()
        table.compactAll()
        require(table.store.tombstones.isEmpty,
          "compactAll must retire the applied tombstones")
        val purged = s.read.format("graft").load(s"$b/table").count()
        require(pending == purged,
          s"pending-tombstone read ($pending) != purged read ($purged)")
        b
      })
      s.read.format("graft").load(s"$base/table")
        .orderBy("l_orderkey", "qty")
    },

    // M14 — last-write-wins upsert: aggregationConfig `last(qty)` with
    // write-generation sequencing (FileReference.seq). Batch 1 loads a
    // value per key; batch 2 re-ingests the keys that have linenumber>=3
    // rows with NEW values — the read must return batch 2's value for
    // those keys and batch 1's for the rest, on BOTH read paths (the
    // Catalyst agg path via max_by(v, seq) and the DSv2 streaming merge
    // via seq-ordered key-tie breaking), before AND after compaction.
    // This is the mutable-row-store semantics (HBase/Bigtable put) the
    // reference's commutative-agg tables can't express.
    "m14_upsert_lww" -> withOracle(
      """WITH b1 AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |            FROM lineitem WHERE l_orderkey < 12000 AND l_linenumber <= 2
        |            GROUP BY 1),
        |     b2 AS (SELECT l_orderkey, CAST(2000000 + SUM(l_quantity) AS BIGINT) AS qty
        |            FROM lineitem WHERE l_orderkey < 12000 AND l_linenumber >= 3
        |            GROUP BY 1)
        |SELECT COALESCE(b1.l_orderkey, b2.l_orderkey) AS l_orderkey,
        |       COALESCE(b2.qty, b1.qty) AS qty
        |FROM b1 FULL JOIN b2 ON b1.l_orderkey = b2.l_orderkey
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val base = upsertDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-upsert-q").toString
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(3000L, 6000L, 9000L),
          config = TableConfig(aggregationConfig = "last(qty)"))
        val raw = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
        // one row per key per batch (deterministic LWW within a batch)
        def gen(f: org.apache.spark.sql.Column, bump: Long) = raw.filter(f)
          .groupBy("l_orderkey")
          .agg((lit(bump) + sum(col("l_quantity").cast("long"))).as("qty"))
        table.ingest(gen(col("l_linenumber") <= 2, 0L))
        table.ingest(gen(col("l_linenumber") >= 3, 2000000L))
        // pre-compaction (two live generations) must equal post-compaction
        val pending = s.read.format("graft").load(s"$b/table")
          .agg(sum(col("qty"))).as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        table.compactAll()
        val folded = s.read.format("graft").load(s"$b/table")
          .agg(sum(col("qty"))).as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        require(pending == folded,
          s"LWW pending read ($pending) != compacted read ($folded)")
        b
      })
      // DSv2 merge path reads the compacted table; the Catalyst agg path
      // (GraftQuery) resolved identically pre-compaction (UpsertSpec)
      s.read.format("graft").load(s"$base/table").orderBy("l_orderkey")
    },

    // M15 — generation-aware deletes (LSM delete-marker semantics):
    // gen 1 loads a value per key, gen 2 deletes keys divisible by 7,
    // gen 3 RE-INGESTS the keys divisible by 14 with new values — while
    // the tombstone is still pending. The marker must suppress only
    // generations <= its own: %14 keys come back with gen-3 values, %7
    // (but not %14) keys stay deleted, everything else keeps gen 1.
    // Checked pending AND post-compaction (compaction applies the marker
    // per input generation, then retires it). The resurrect-after-delete
    // contract no other read path piece can fake.
    "m15_delete_reinsert" -> withOracle(
      """WITH b1 AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |            FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey,
        |       CASE WHEN l_orderkey % 14 = 0 THEN 4000000 + qty ELSE qty END AS qty
        |FROM b1
        |WHERE l_orderkey % 7 <> 0 OR l_orderkey % 14 = 0
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val base = reinsertDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-reinsert-q").toString
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(3000L, 6000L, 9000L),
          config = TableConfig(aggregationConfig = "last(qty)"))
        val raw = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
        val gen1 = raw.groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("long")).as("qty"))
        table.ingest(gen1)
        table.deleteKeys(gen1.select("l_orderkey")
          .filter(col("l_orderkey") % 7 === 0))
        table.ingest(gen1.filter(col("l_orderkey") % 14 === 0)
          .select(col("l_orderkey"), (col("qty") + 4000000L).as("qty")))
        // the pending-marker read must equal the post-compaction read
        val pending = s.read.format("graft").load(s"$b/table")
          .agg(sum(col("qty"))).as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        table.compactAll()
        require(table.store.tombstones.isEmpty, "compactAll must retire the marker")
        val folded = s.read.format("graft").load(s"$b/table")
          .agg(sum(col("qty"))).as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        require(pending == folded,
          s"pending-marker read ($pending) != compacted read ($folded)")
        b
      })
      s.read.format("graft").load(s"$base/table").orderBy("l_orderkey")
    },

    // M16 — MERGE INTO (one atomic commit): a CDC-shaped source with an
    // _op column outside the table schema updates keys divisible by 3
    // and deletes keys divisible by 5 against a last-write-wins base —
    // Delta/Iceberg MERGE semantics at O(source) cost (one sorted put
    // write + one key-only marker write, ZERO rewrite of existing data:
    // the LSM advantage over copy-on-write MERGE). The fixture asserts
    // the commit is exactly one state-store version and that the
    // pending-marker read equals the post-compaction read.
    "m16_merge_into" -> withOracle(
      """WITH b1 AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |            FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey,
        |       CASE WHEN l_orderkey % 3 = 0 THEN 5000000 + qty ELSE qty END AS qty
        |FROM b1
        |WHERE l_orderkey % 5 <> 0
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val base = mergeDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-merge-q").toString
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(3000L, 6000L, 9000L),
          config = TableConfig(aggregationConfig = "last(qty)"))
        val raw = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
        val gen1 = raw.groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("long")).as("qty"))
        table.ingest(gen1)
        val v0 = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
        // one CDC batch: updates for %3 keys, deletes for %5 keys
        // (deleteWhen wins for keys divisible by 15 — they are deleted)
        val source = gen1
          .filter(col("l_orderkey") % 3 === 0 || col("l_orderkey") % 5 === 0)
          .select(col("l_orderkey"), (col("qty") + 5000000L).as("qty"),
            when(col("l_orderkey") % 5 === 0, "delete").otherwise("put").as("_op"))
        table.merge(source, col("_op") === "delete")
        require(table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion == v0 + 1,
          "MERGE must commit exactly one version")
        val pending = s.read.format("graft").load(s"$b/table")
          .agg(sum(col("qty"))).as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        table.compactAll()
        require(table.store.tombstones.isEmpty, "compactAll must retire the markers")
        val folded = s.read.format("graft").load(s"$b/table")
          .agg(sum(col("qty"))).as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        require(pending == folded,
          s"pending-marker read ($pending) != compacted read ($folded)")
        b
      })
      s.read.format("graft").load(s"$base/table").orderBy("l_orderkey")
    },

    // X14 — SQL row-level DML end to end through the TableCatalog: a
    // last-write-wins table mutated by pure SQL — exact-key DELETE
    // (optimized to metadata-only tombstones: the fixture asserts zero
    // new data files), predicate DELETE and UPDATE through the
    // merge-on-read row-level path (delete markers + one-generation-up
    // puts, one atomic commit per statement), and a three-clause MERGE
    // INTO (matched-delete / matched-update / not-matched-insert). The
    // oracle replays the same statement sequence as relational algebra.
    "x14_sql_dml" -> withOracle(
      """WITH b1 AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |            FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1),
        |d0 AS (SELECT * FROM b1 WHERE l_orderkey NOT IN (35, 70, 105)),
        |d1 AS (SELECT * FROM d0 WHERE l_orderkey % 11 <> 0),
        |u1 AS (SELECT l_orderkey,
        |              CASE WHEN l_orderkey % 4 = 0 THEN qty + 1000000 ELSE qty END AS qty
        |       FROM d1),
        |m1 AS (SELECT l_orderkey,
        |              CASE WHEN l_orderkey % 6 = 0 THEN qty + 7000000 ELSE qty END AS qty
        |       FROM u1 WHERE l_orderkey % 9 <> 0),
        |ins AS (SELECT l_orderkey, CAST(7000000 AS BIGINT) AS qty FROM b1
        |        WHERE l_orderkey % 6 = 0 AND l_orderkey % 9 <> 0
        |          AND l_orderkey NOT IN (SELECT l_orderkey FROM u1))
        |SELECT * FROM (SELECT * FROM m1 UNION ALL SELECT * FROM ins)
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val cat = s"graft_dml_${(dir.hashCode.toLong & 0xffffffffL).toHexString}"
      sqlDmlRoots.computeIfAbsent(dir, { _ =>
        val root = java.nio.file.Files.createTempDirectory("graft-dml-root").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(
          s"""CREATE TABLE $cat.t (l_orderkey BIGINT, qty BIGINT NOT NULL)
             |USING graft
             |TBLPROPERTIES('rowKeys'='l_orderkey', 'splitPoints'='4000,8000',
             |              'aggregation'='last(qty)')""".stripMargin)
        Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))
          .createOrReplaceTempView("dml_src_x14")
        s.sql(s"INSERT INTO $cat.t SELECT * FROM dml_src_x14")
        val filesBefore = graft.meta.JsonStateStore.load(s"$root/t/meta").fileReferences.size
        // metadata-only path: exact keys → tombstones, no scan, no files
        s.sql(s"DELETE FROM $cat.t WHERE l_orderkey IN (35, 70, 105)")
        val st = graft.meta.JsonStateStore.load(s"$root/t/meta")
        require(st.fileReferences.size == filesBefore,
          "exact-key SQL DELETE must not write data files")
        require(st.tombstones.nonEmpty, "exact-key SQL DELETE must land as tombstones")
        // scan-based row-level path
        s.sql(s"DELETE FROM $cat.t WHERE l_orderkey % 11 = 0")
        s.sql(s"UPDATE $cat.t SET qty = qty + 1000000 WHERE l_orderkey % 4 = 0")
        s.sql(
          s"""MERGE INTO $cat.t AS tgt
             |USING (SELECT l_orderkey,
             |              CASE WHEN l_orderkey % 9 = 0 THEN 'del' ELSE 'put' END AS op
             |       FROM dml_src_x14
             |       WHERE l_orderkey % 6 = 0 OR l_orderkey % 9 = 0) AS src
             |ON tgt.l_orderkey = src.l_orderkey
             |WHEN MATCHED AND src.op = 'del' THEN DELETE
             |WHEN MATCHED THEN UPDATE SET qty = tgt.qty + 7000000
             |WHEN NOT MATCHED AND src.op = 'put' THEN
             |  INSERT (l_orderkey, qty) VALUES (src.l_orderkey, 7000000)
             |""".stripMargin)
        // the mutated state must read identically pending and compacted
        val pending = s.sql(s"SELECT CAST(SUM(qty) AS BIGINT) FROM $cat.t")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        graft.table.GraftTable.load(s, s"$root/t").compactAll()
        val folded = s.sql(s"SELECT CAST(SUM(qty) AS BIGINT) FROM $cat.t")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        require(pending == folded,
          s"pending-marker read ($pending) != compacted read ($folded)")
        root
      })
      s.sql(s"SELECT l_orderkey, qty FROM $cat.t ORDER BY l_orderkey")
    },

    // X15 — SQL time travel through the TableCatalog: `VERSION AS OF`
    // pins a read-only view at a captured state version, served from the
    // retained log/snapshot chain — the table is then mutated (UPDATE +
    // DELETE) and the pinned view must still read the ORIGINAL state
    // (the oracle replays only the base load). TIMESTAMP AS OF is
    // asserted fixture-side (resolves to the newest commit <= t).
    "x15_sql_time_travel" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val cat = s"graft_tt_${(dir.hashCode.toLong & 0xffffffffL).toHexString}"
      val (_, v1) = sqlTravelRoots.computeIfAbsent(dir, { _ =>
        val root = java.nio.file.Files.createTempDirectory("graft-tt-root").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(
          s"""CREATE TABLE $cat.t (l_orderkey BIGINT, qty BIGINT NOT NULL)
             |USING graft
             |TBLPROPERTIES('rowKeys'='l_orderkey', 'splitPoints'='4000,8000',
             |              'aggregation'='last(qty)')""".stripMargin)
        Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))
          .createOrReplaceTempView("tt_src_x15")
        s.sql(s"INSERT INTO $cat.t SELECT * FROM tt_src_x15")
        val v = graft.meta.JsonStateStore.load(s"$root/t/meta").currentVersion
        // mutate AFTER the capture: the pinned view must not see these
        s.sql(s"UPDATE $cat.t SET qty = qty + 5000000 WHERE l_orderkey % 5 = 0")
        s.sql(s"DELETE FROM $cat.t WHERE l_orderkey % 13 = 0")
        val liveRows = s.sql(s"SELECT count(*) FROM $cat.t")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        val pinnedRows = s.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF $v")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        require(pinnedRows > liveRows,
          s"pinned view must keep the deleted keys ($pinnedRows vs $liveRows)")
        // TIMESTAMP AS OF now = the full current state
        val ts = new java.sql.Timestamp(System.currentTimeMillis() + 1000)
        val atNow = s.sql(s"SELECT count(*) FROM $cat.t TIMESTAMP AS OF '$ts'")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        require(atNow == liveRows, s"TIMESTAMP AS OF now ($atNow) != live ($liveRows)")
        (root, v)
      })
      s.sql(s"SELECT l_orderkey, qty FROM $cat.t VERSION AS OF $v1 ORDER BY l_orderkey")
    },

    // X16 — SQL metadata tables (Iceberg-style `$files` / `$partitions`
    // / `$tombstones` / `$history`): metadata-only relations over the
    // state store, oracle-checked against ground truth recomputed from
    // the source rows (file/leaf/version counts are deterministic:
    // one ingest writes one sorted file per touched leaf, one exact-key
    // DELETE lands one tombstone file per affected leaf).
    "x16_sql_metadata" -> withOracle(
      """SELECT CAST(3 AS BIGINT) AS file_leaves,
        |       (SELECT count(DISTINCT l_orderkey) FROM lineitem
        |        WHERE l_orderkey < 12000) AS total_rows,
        |       CAST(3 AS BIGINT) AS leaves,
        |       CAST(1 AS BIGINT) AS tomb_files,
        |       CAST(3 AS BIGINT) AS tomb_keys,
        |       CAST(3 AS BIGINT) AS versions""".stripMargin) { (s, dir) =>
      val cat = s"graft_meta_${(dir.hashCode.toLong & 0xffffffffL).toHexString}"
      sqlMetaRoots.computeIfAbsent(dir, { _ =>
        val root = java.nio.file.Files.createTempDirectory("graft-meta-root").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(
          s"""CREATE TABLE $cat.t (l_orderkey BIGINT, qty BIGINT NOT NULL)
             |USING graft
             |TBLPROPERTIES('rowKeys'='l_orderkey', 'splitPoints'='4000,8000')""".stripMargin)
        Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))
          .createOrReplaceTempView("meta_src_x16")
        s.sql(s"INSERT INTO $cat.t SELECT * FROM meta_src_x16")
        // keys 35/70/105 share the first leaf: exactly one tombstone file
        s.sql(s"DELETE FROM $cat.t WHERE l_orderkey IN (35, 70, 105)")
        root
      })
      s.sql(
        // leaves-holding-files, not raw file count: how many files the
        // ingest writes per leaf scales with the batch size (salted
        // multi-file writes above the small-batch gate), so a raw count
        // is not scale-independent ground truth
        s"""SELECT
           |  (SELECT count(DISTINCT partition_id) FROM $cat.`t$$files`) AS file_leaves,
           |  (SELECT CAST(sum(row_count) AS BIGINT) FROM $cat.`t$$files`) AS total_rows,
           |  (SELECT count(*) FROM $cat.`t$$partitions` WHERE is_leaf) AS leaves,
           |  (SELECT count(*) FROM $cat.`t$$tombstones`) AS tomb_files,
           |  (SELECT CAST(sum(row_count) AS BIGINT) FROM $cat.`t$$tombstones`) AS tomb_keys,
           |  (SELECT count(*) FROM $cat.`t$$history`) AS versions""".stripMargin)
    },

    // X17 — SQL schema evolution: ALTER TABLE ADD COLUMN runs the m11
    // O(1) AddColumn transaction from pure SQL; rows ingested before the
    // change null-fill, rows after carry values, and a VERSION AS OF
    // read from before the change still shows the OLD schema
    // (fixture-side require).
    "x17_sql_add_column" -> withOracle(
      """WITH b AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |           FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey, qty,
        |       CASE WHEN l_orderkey >= 6000 THEN qty * 2 ELSE NULL END AS extra
        |FROM b ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val cat = s"graft_evolve_${(dir.hashCode.toLong & 0xffffffffL).toHexString}"
      sqlEvolveRoots.computeIfAbsent(dir, { _ =>
        val root = java.nio.file.Files.createTempDirectory("graft-evolve-root").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(
          s"""CREATE TABLE $cat.t (l_orderkey BIGINT, qty BIGINT NOT NULL)
             |USING graft
             |TBLPROPERTIES('rowKeys'='l_orderkey', 'splitPoints'='4000,8000')""".stripMargin)
        Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))
          .createOrReplaceTempView("evolve_src_x17")
        s.sql(s"INSERT INTO $cat.t SELECT * FROM evolve_src_x17 WHERE l_orderkey < 6000")
        val preAlter = graft.meta.JsonStateStore.load(s"$root/t/meta").currentVersion
        s.sql(s"ALTER TABLE $cat.t ADD COLUMN extra BIGINT")
        s.sql(s"INSERT INTO $cat.t SELECT l_orderkey, qty, qty * 2 " +
          s"FROM evolve_src_x17 WHERE l_orderkey >= 6000")
        // the pre-change version still reads with the OLD schema
        val oldCols = s.sql(s"SELECT * FROM $cat.t VERSION AS OF $preAlter").columns.toSeq
        require(oldCols == Seq("l_orderkey", "qty"),
          s"pre-alter time travel must show the old schema, got $oldCols")
        root
      })
      s.sql(s"SELECT l_orderkey, qty, extra FROM $cat.t ORDER BY l_orderkey")
    },

    // X18 — versioned table-property edits from SQL (the reference's
    // interactive admin property editor, as ONE validated metadata
    // transaction): ALTER TABLE SET TBLPROPERTIES installs an ageOff
    // filter on a LIVE table — reads apply it forward immediately
    // (rows with ancient timestamps vanish; year-2100 rows stay) — and
    // the edit versions through the log (fixture asserts a VERSION AS OF
    // read from before the edit still sees every row, and UNSET brings
    // the live rows back then re-sets for the oracle read).
    "x18_sql_set_properties" -> withOracle(
      """WITH b AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |           FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey, qty FROM b WHERE l_orderkey % 2 = 0
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val cat = s"graft_props_${(dir.hashCode.toLong & 0xffffffffL).toHexString}"
      sqlPropsRoots.computeIfAbsent(dir, { _ =>
        val root = java.nio.file.Files.createTempDirectory("graft-props-root").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(
          s"""CREATE TABLE $cat.t (l_orderkey BIGINT, ts BIGINT, qty BIGINT NOT NULL)
             |USING graft
             |TBLPROPERTIES('rowKeys'='l_orderkey', 'splitPoints'='4000,8000')""".stripMargin)
        // odd keys: epoch 0 (always aged); even keys: year 2100 (kept)
        Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))
          .select(col("l_orderkey"),
            when(col("l_orderkey") % 2 === 0, lit(4102444800000L))
              .otherwise(lit(0L)).as("ts"),
            col("qty"))
          .createOrReplaceTempView("props_src_x18")
        s.sql(s"INSERT INTO $cat.t SELECT * FROM props_src_x18")
        val vBefore = graft.meta.JsonStateStore.load(s"$root/t/meta").currentVersion
        val all = s.sql(s"SELECT count(*) FROM $cat.t")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        s.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('filter'='ageOff(ts,1000000)')")
        // the edit versions through the log: pre-edit version reads ALL rows
        val pinned = s.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF $vBefore")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        require(pinned == all, s"pre-edit version must see all rows ($pinned vs $all)")
        // UNSET restores; re-set for the oracle read
        s.sql(s"ALTER TABLE $cat.t UNSET TBLPROPERTIES('filter')")
        val unset = s.sql(s"SELECT count(*) FROM $cat.t")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        require(unset == all, s"UNSET must restore the aged rows ($unset vs $all)")
        s.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('filter'='ageOff(ts,1000000)')")
        root
      })
      s.sql(s"SELECT l_orderkey, qty FROM $cat.t ORDER BY l_orderkey")
    },

    // T46 — streaming CDC apply: a continuously-consumed change feed
    // (table schema + _op column) lands through StreamingMerge — each
    // micro-batch is ONE atomic Merge commit (puts + delete markers)
    // under the idempotent txn watermark, i.e. the Delta foreachBatch +
    // MERGE INTO idiom with the atomicity inside the engine. Batch 1
    // seeds every key; batch 2 deletes %7 keys and updates %3 keys in
    // the SAME feed file (delete wins for %21). Exactly-once is
    // asserted by the version count; LWW resolves the rest.
    "t46_stream_cdc" -> withOracle(
      """WITH b1 AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |            FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey,
        |       CASE WHEN l_orderkey % 3 = 0 THEN 7000000 + qty ELSE qty END AS qty
        |FROM b1
        |WHERE l_orderkey % 7 <> 0
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val base = cdcApplyDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-cdc-apply-q").toString
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(3000L, 6000L, 9000L),
          config = TableConfig(aggregationConfig = "last(qty)"))
        val inbox = s"$b/inbox"; val cp = s"$b/cp"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
        val applyStream = new graft.streaming.StreamingMerge(table, inbox, cp)
        val gen1 = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))

        def drop(name: String, batch: org.apache.spark.sql.DataFrame): Unit = {
          val stage = java.nio.file.Files.createTempDirectory("graft-cdc-stage")
          batch.coalesce(1).write.mode("overwrite").parquet(stage.toString)
          val it = java.nio.file.Files.list(stage).iterator()
          var part: java.nio.file.Path = null
          while (it.hasNext) {
            val p = it.next()
            if (p.getFileName.toString.endsWith(".parquet")) part = p
          }
          java.nio.file.Files.move(part, java.nio.file.Paths.get(inbox, name))
        }

        drop("b1.parquet", gen1.select(col("l_orderkey"), col("qty"), lit("put").as("_op")))
        require(applyStream.runOnce() == 1, "first CDC cycle should dispatch one file")
        val v1 = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
        drop("b2.parquet", gen1
          .filter(col("l_orderkey") % 3 === 0 || col("l_orderkey") % 7 === 0)
          .select(col("l_orderkey"), (col("qty") + 7000000L).as("qty"),
            when(col("l_orderkey") % 7 === 0, "delete").otherwise("put").as("_op")))
        require(applyStream.runOnce() == 1, "second CDC cycle should dispatch one file")
        require(table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion == v1 + 1,
          "a CDC micro-batch must land as exactly one atomic version")
        require(applyStream.runOnce() == 0, "drained inbox must not re-dispatch")
        b
      })
      s.read.format("graft").load(s"$base/table").orderBy("l_orderkey")
    },

    // T48 — native structured-streaming SINK: an arbitrary streaming
    // pipeline (here a parquet file feed) lands in a graft table via
    // df.writeStream.format("graft") — each epoch is one atomic write
    // generation under the (sink:queryId, epochId) watermark, so the
    // two AvailableNow windows land exactly-once and LWW resolves the
    // second window's updates above the first. Writers emit per-task
    // root-homed shared files (never per-leaf micro-files). Unlike
    // t1_streaming (the inbox-ingest main), this is the DSv2 sink any
    // readStream source can feed.
    "t48_stream_sink" -> withOracle(
      """WITH b AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |           FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey,
        |       CASE WHEN l_orderkey % 5 = 0 THEN qty + 7000000 ELSE qty END AS qty
        |FROM b ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val base = sinkDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-sink-q").toString
        graft.streaming.StreamTuning.tune(s, Some(s"$b/cp"))
        GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(3000L, 6000L, 9000L),
          config = TableConfig(aggregationConfig = "last(qty)"))
        val src = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))
        val inbox = s"$b/inbox"
        def drain(): Unit = {
          val q = s.readStream
            .schema(org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("l_orderkey",
                org.apache.spark.sql.types.LongType, nullable = false),
              org.apache.spark.sql.types.StructField("qty",
                org.apache.spark.sql.types.LongType, nullable = false))))
            .parquet(inbox)
            .writeStream.format("graft")
            .option("path", s"$b/table")
            .option("checkpointLocation", s"$b/cp")
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        src.coalesce(1).write.mode("append").parquet(inbox)
        drain() // window 1: the base corpus
        src.filter(col("l_orderkey") % 5 === 0)
          .select(col("l_orderkey"), (col("qty") + 7000000L).as("qty"))
          .coalesce(1).write.mode("append").parquet(inbox)
        drain() // window 2: LWW updates, a newer generation
        val table = GraftTable.load(s, s"$b/table")
        val wm = table.store.asInstanceOf[graft.meta.JsonStateStore].txnWatermarks
        require(wm.keys.exists(_.startsWith("sink:")),
          "epoch watermark must be recorded for exactly-once")
        require(table.store.fileReferences.forall(r =>
          r.physicalPartitionId == table.store.partitionTree.root.id),
          "sink writers must emit root-homed shared files")
        b
      })
      GraftTable.load(s, s"$base/table").toDF
        .select("l_orderkey", "qty").orderBy("l_orderkey")
    },

    // X20 — RESTORE to a version (Delta RESTORE): an LWW table takes
    // updates and a delete, is rolled back to the pre-mutation version
    // in ONE metadata commit (no data IO — the dropped generations move
    // to the GC queue), and keeps working: a post-restore update lands
    // as a new generation above the restored state. The oracle replays
    // base-then-post-restore-update; the fixture asserts the
    // mutated-state read differed and the restore cost exactly one
    // version.
    "x20_restore" -> withOracle(
      """WITH b AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |           FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey,
        |       CASE WHEN l_orderkey % 100 = 0 THEN qty + 333 ELSE qty END AS qty
        |FROM b ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val base = restoreDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-restore-q").toString
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(3000L, 6000L, 9000L),
          config = TableConfig(aggregationConfig = "last(qty)"))
        val src = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))
        table.ingest(src)
        val v1 = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
        val baseCount = table.toDF.count()
        // mutate: updates + a delete…
        table.ingest(src.filter(col("l_orderkey") % 4 === 0)
          .select(col("l_orderkey"), (col("qty") + 1000000L).as("qty")))
        table.deleteKeys(src.filter(col("l_orderkey") % 10 === 0).select("l_orderkey"))
        require(table.toDF.count() < baseCount, "mutations must be visible pre-restore")
        // …then roll back in ONE commit and keep writing
        val vPre = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
        table.restoreTo(v1)
        require(table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
          == vPre + 1, "restore must cost exactly one metadata version")
        require(table.toDF.count() == baseCount, "restored contents")
        table.ingest(src.filter(col("l_orderkey") % 100 === 0)
          .select(col("l_orderkey"), (col("qty") + 333L).as("qty")))
        b
      })
      GraftTable.load(s, s"$base/table").toDF
        .select("l_orderkey", "qty").orderBy("l_orderkey")
    },

    // X21 — SQL stored procedures (Spark 4 ProcedureCatalog): the whole
    // maintenance loop — compact, gc, metrics snapshot — driven through
    // CALL statements against the catalog, no Scala API in the path
    // (reference: java/clients/src/main/java/sleeper/clients/admin/ —
    // its console commands become SQL procedures here). The fixture
    // asserts the CALL results themselves (3 files/leaf -> 1, a second
    // compact plans zero jobs, the snapshot row counts match), then the
    // oracle re-checks the post-maintenance table contents.
    "x21_sql_call" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val cat = s"graft_call_${(dir.hashCode.toLong & 0xffffffffL).toHexString}"
      sqlCallRoots.computeIfAbsent(dir, { _ =>
        val root = java.nio.file.Files.createTempDirectory("graft-call-root").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(
          s"""CREATE TABLE $cat.t (l_orderkey BIGINT, qty BIGINT NOT NULL)
             |USING graft
             |TBLPROPERTIES('rowKeys'='l_orderkey', 'splitPoints'='4000,8000')""".stripMargin)
        Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))
          .createOrReplaceTempView("call_src_x21")
        // three ingests -> 3 files per leaf; CALL compact merges each leaf
        (0 until 3).foreach { i =>
          s.sql(s"INSERT INTO $cat.t SELECT * FROM call_src_x21 WHERE l_orderkey % 3 = $i")
        }
        val r = s.sql(s"CALL $cat.system.compact('t')").collect().head
        require(r.getInt(0) == 3 && r.getInt(1) >= 9 && r.getInt(2) == 3,
          s"expected 3 leaf jobs merging >=9 file refs to 3, got $r")
        val again = s.sql(s"CALL $cat.system.compact('t', strategy => 'size_ratio')")
          .collect().head
        require(again.getInt(0) == 0, s"second compact must plan zero jobs, got $again")
        val snap = s.sql(s"CALL $cat.system.snapshot_metrics('t', 'ops_metrics')")
          .collect().head
        require(snap.getString(0) == "t" && snap.getLong(2) == 3L,
          s"snapshot must report 3 post-compaction files, got $snap")
        require(s.sql(s"SELECT count(*) FROM $cat.ops_metrics")
          .collect().head.getLong(0) == 1L, "snapshot must land in the metrics table")
        s.sql(s"CALL $cat.system.gc('t')").collect() // retired inputs -> GC queue
        root
      })
      s.sql(s"SELECT l_orderkey, qty FROM $cat.t ORDER BY l_orderkey")
    },

    // X19 — atomic INSERT OVERWRITE + TRUNCATE TABLE: overwrite lands
    // as ONE composite version (Truncate + AddFiles via the Batch
    // transaction) — a reader sees old contents or new, never
    // empty-in-between (fixture asserts the version delta is exactly 1
    // and a pre-overwrite VERSION AS OF still reads the old rows);
    // TRUNCATE on a sibling table is O(1) metadata with the files left
    // to GC. The oracle replays the overwrite as relational algebra.
    "x19_sql_overwrite" -> withOracle(
      """WITH b AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |           FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey, qty * 3 AS qty FROM b
        |WHERE l_orderkey >= 2000 AND l_orderkey < 5000
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val cat = s"graft_ow_${(dir.hashCode.toLong & 0xffffffffL).toHexString}"
      sqlOverwriteRoots.computeIfAbsent(dir, { _ =>
        val root = java.nio.file.Files.createTempDirectory("graft-ow-root").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(
          s"""CREATE TABLE $cat.t (l_orderkey BIGINT, qty BIGINT NOT NULL)
             |USING graft
             |TBLPROPERTIES('rowKeys'='l_orderkey', 'splitPoints'='4000,8000')""".stripMargin)
        Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))
          .createOrReplaceTempView("ow_src_x19")
        s.sql(s"INSERT INTO $cat.t SELECT * FROM ow_src_x19")
        val all = s.sql(s"SELECT count(*) FROM $cat.t")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        val v1 = graft.meta.JsonStateStore.load(s"$root/t/meta").currentVersion
        s.sql(s"INSERT OVERWRITE $cat.t " +
          s"SELECT l_orderkey, qty * 3 FROM ow_src_x19 " +
          s"WHERE l_orderkey >= 2000 AND l_orderkey < 5000")
        val st = graft.meta.JsonStateStore.load(s"$root/t/meta")
        require(st.currentVersion == v1 + 1,
          s"INSERT OVERWRITE must be ONE atomic version (${st.currentVersion} vs ${v1 + 1})")
        val pinned = s.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF $v1")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        require(pinned == all, s"pre-overwrite version must read old rows ($pinned/$all)")
        // TRUNCATE on a sibling: O(1) metadata, table stays usable
        s.sql(s"CREATE TABLE $cat.scratch (l_orderkey BIGINT, qty BIGINT NOT NULL) " +
          "USING graft TBLPROPERTIES('rowKeys'='l_orderkey')")
        s.sql(s"INSERT INTO $cat.scratch SELECT * FROM ow_src_x19 WHERE l_orderkey < 100")
        s.sql(s"TRUNCATE TABLE $cat.scratch")
        val empty = s.sql(s"SELECT count(*) FROM $cat.scratch")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        require(empty == 0L, s"TRUNCATE must empty the table ($empty rows)")
        root
      })
      s.sql(s"SELECT l_orderkey, qty FROM $cat.t ORDER BY l_orderkey")
    },

    // X21 — atomic CTAS / RTAS / RENAME (StagingTableCatalog): the table
    // is built whole in a hidden .staging home and renamed into the
    // catalog namespace at commit, so a failed SELECT publishes nothing
    // (checked mid-fixture with a throwing UDF) and REPLACE TABLE AS
    // SELECT swaps old-for-new with readers never seeing a partial
    // table. The final read goes through ALTER TABLE RENAME, proving
    // the table-relative metadata moves with the directory.
    "x21_sql_ctas" -> withOracle(
      """WITH b AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |           FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey, qty * 2 AS qty FROM b
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val cat = s"graft_ctas_${(dir.hashCode.toLong & 0xffffffffL).toHexString}"
      sqlCtasRoots.computeIfAbsent(dir, { _ =>
        val root = java.nio.file.Files.createTempDirectory("graft-ctas-root").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))
          .createOrReplaceTempView("ctas_src_x21")
        s.sql(
          s"""CREATE TABLE $cat.ct USING graft
             |TBLPROPERTIES('rowKeys'='l_orderkey', 'splitPoints'='4000,8000')
             |AS SELECT l_orderkey, qty FROM ctas_src_x21""".stripMargin)
        val created = s.sql(s"SELECT count(*) FROM $cat.ct")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        // a failing RTAS must leave the old table byte-identical
        s.udf.register("x21_boom", (x: Long) =>
          if (x >= 0) throw new RuntimeException("boom") else x)
        val failed = try {
          s.sql(s"REPLACE TABLE $cat.ct USING graft " +
            "TBLPROPERTIES('rowKeys'='l_orderkey') " +
            "AS SELECT l_orderkey, x21_boom(qty) AS qty FROM ctas_src_x21")
          false
        } catch { case _: Exception => true }
        require(failed, "the throwing RTAS must fail")
        val survived = s.sql(s"SELECT count(*) FROM $cat.ct")
          .as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        require(survived == created,
          s"failed RTAS must keep the old table ($survived/$created rows)")
        require(graft.meta.GraftFS.list(s"$root/.staging").isEmpty,
          "aborted RTAS must delete its scratch home")
        s.sql(
          s"""REPLACE TABLE $cat.ct USING graft
             |TBLPROPERTIES('rowKeys'='l_orderkey', 'splitPoints'='4000,8000')
             |AS SELECT l_orderkey, qty * 2 AS qty FROM ctas_src_x21""".stripMargin)
        // the RENAME TO target is an identifier INSIDE the same catalog
        s.sql(s"ALTER TABLE $cat.ct RENAME TO ct2")
        root
      })
      s.sql(s"SELECT l_orderkey, qty FROM $cat.ct2 ORDER BY l_orderkey")
    },

    // X22 — zero-copy branch (CALL clone, shallow=true by default):
    // branching a table is ONE state-store write — the branch's refs
    // point at the source's files by absolute path (Delta SHALLOW CLONE
    // contract; at 100 TB this is the difference between an instant
    // branch and a day of copy). The fixture proves the three contract
    // edges: no data bytes copied at clone time, branch DML/compaction/
    // GC never touch a source byte, and the source reads unchanged
    // after the branch diverged. The oracle replays the branch edits.
    "x22_shallow_clone" -> withOracle(
      """WITH b AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |           FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey,
        |       CASE WHEN l_orderkey % 3 = 0 THEN qty + 100 ELSE qty END AS qty
        |FROM b WHERE l_orderkey % 7 <> 0
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val cat = s"graft_clone_${(dir.hashCode.toLong & 0xffffffffL).toHexString}"
      sqlCloneRoots.computeIfAbsent(dir, { _ =>
        val root = java.nio.file.Files.createTempDirectory("graft-clone-root").toString
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(
          s"""CREATE TABLE $cat.src (l_orderkey BIGINT, qty BIGINT NOT NULL)
             |USING graft
             |TBLPROPERTIES('rowKeys'='l_orderkey', 'splitPoints'='4000,8000',
             |              'aggregation'='last(qty)')""".stripMargin)
        Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))
          .createOrReplaceTempView("clone_src_x22")
        s.sql(s"INSERT INTO $cat.src SELECT * FROM clone_src_x22")
        def fingerprint(t: String): (Long, Long) =
          s.sql(s"SELECT count(*), sum(qty) FROM $cat.$t")
            .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaLong)).head()
        val srcBefore = fingerprint("src")
        def parquetsUnder(d: String): Seq[java.nio.file.Path] = {
          val p = java.nio.file.Paths.get(d)
          if (!java.nio.file.Files.exists(p)) Nil
          else {
            val st = java.nio.file.Files.walk(p)
            try {
              val it = st.iterator(); val b = Seq.newBuilder[java.nio.file.Path]
              while (it.hasNext) { val x = it.next()
                if (x.toString.endsWith(".parquet")) b += x }
              b.result()
            } finally st.close()
          }
        }
        val srcFiles = parquetsUnder(s"$root/src/data")
        val r = s.sql(s"CALL $cat.system.clone('src', 'branch')").collect().head
        require(r.getBoolean(3) && r.getInt(2) > 0, s"expected a shallow clone, got $r")
        require(parquetsUnder(s"$root/branch/data").isEmpty,
          "shallow clone must copy ZERO data files")
        // branch diverges through normal SQL DML + maintenance
        s.sql(s"UPDATE $cat.branch SET qty = qty + 100 WHERE l_orderkey % 3 = 0")
        s.sql(s"DELETE FROM $cat.branch WHERE l_orderkey % 7 = 0")
        s.sql(s"CALL $cat.system.compact('branch')").collect()
        s.sql(s"CALL $cat.system.gc('branch')").collect()
        require(srcFiles.forall(java.nio.file.Files.exists(_)),
          "branch lifecycle must never delete a source file")
        require(fingerprint("src") == srcBefore,
          "source reads must be unchanged after the branch diverged")
        root
      })
      s.sql(s"SELECT l_orderkey, qty FROM $cat.branch ORDER BY l_orderkey")
    },

    // T47 — streaming change-data-feed (readChangeFeed): puts AND
    // row-key deletes as a stream with (_op, _commit_version,
    // _commit_seq) — the streaming form of the batch CDC feeds, and the
    // lift of the insert-only stream's documented no-retractions gap.
    // The fixture mutates an LWW table (update, delete,
    // delete-then-reingest), drains the feed exactly-once (AvailableNow
    // + checkpoint, two windows: snapshot then incremental), and the
    // QUERY resolves the raw feed per key by (version, seq) — the
    // resolution matching the table's own reads is exactly what the
    // oracle checks.
    "t47_stream_cdf" -> withOracle(
      """WITH b AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |           FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey,
        |       CASE WHEN l_orderkey % 21 = 0 THEN 9000000
        |            WHEN l_orderkey % 3 = 0 THEN qty + 7000000
        |            ELSE qty END AS qty
        |FROM b
        |WHERE l_orderkey % 7 <> 0 OR l_orderkey % 21 = 0
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val base = cdfFeedDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-cdf-q").toString
        graft.streaming.StreamTuning.tune(s, Some(s"$b/cp"))
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(3000L, 6000L, 9000L),
          config = TableConfig(aggregationConfig = "last(qty)"))
        val gen1 = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
          .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("qty"))

        def drain(): Unit = {
          val q = s.readStream.format("graft").option("readChangeFeed", "true")
            .load(s"$b/table")
            .writeStream.format("parquet")
            .option("path", s"$b/feed").option("checkpointLocation", s"$b/cp")
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }

        table.ingest(gen1)
        drain() // window 1: initial snapshot, all puts
        table.ingest(gen1.filter(col("l_orderkey") % 3 === 0)
          .select(col("l_orderkey"), (col("qty") + 7000000L).as("qty")))
        table.deleteKeys(gen1.filter(col("l_orderkey") % 7 === 0).select("l_orderkey"))
        table.ingest(gen1.filter(col("l_orderkey") % 21 === 0)
          .select(col("l_orderkey"), lit(9000000L).as("qty")))
        table.compactAll() // rewrites must not re-feed
        drain() // window 2: update + deletes + reingest, exactly once
        val feed = s.read.parquet(s"$b/feed")
        require(feed.filter(col("_op") === "delete").count() > 0,
          "the feed must deliver the delete markers")
        b
      })
      // resolve the raw feed: newest (version, seq) wins per key; a
      // surviving 'put' is a live row — must equal the table's own read
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
        .orderBy(col("_commit_version").desc, col("_commit_seq").desc)
      s.read.parquet(s"$base/feed")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1 && col("_op") === "put")
        .select("l_orderkey", "qty")
        .orderBy("l_orderkey")
    },

    // X13 — deep clone at a version (branch-for-experiments): an LWW
    // table with two write generations and a PENDING delete marker is
    // cloned at that version; the source then takes a third generation,
    // more deletes, compaction and GC — none of which may leak into the
    // clone (physical independence), while the clone's own compaction
    // must still apply and retire the cloned pending marker. The copy
    // preserves layout/sort/sketches and the generation seqs, so zero
    // shuffle, re-sort, or sketch rebuild. Emitted: the clone, read
    // through DSv2 after ITS compaction.
    "x13_clone" -> withOracle(
      """WITH b1 AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |            FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey,
        |       CASE WHEN l_orderkey % 2 = 0 THEN 1000000 + qty ELSE qty END AS qty
        |FROM b1
        |WHERE l_orderkey % 9 <> 0
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val base = cloneDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-clone-q").toString
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(3000L, 6000L, 9000L),
          config = TableConfig(aggregationConfig = "last(qty)"))
        val raw = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
        val gen1 = raw.groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("long")).as("qty"))
        table.ingest(gen1)
        table.ingest(gen1.filter(col("l_orderkey") % 2 === 0)
          .select(col("l_orderkey"), (col("qty") + 1000000L).as("qty")))
        table.deleteKeys(gen1.select("l_orderkey").filter(col("l_orderkey") % 9 === 0))
        val v = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
        val clone = table.cloneAt(s"$b/clone", v)
        // the source moves on — generation, delete, compaction, GC
        table.ingest(gen1.filter(col("l_orderkey") % 5 === 0)
          .select(col("l_orderkey"), (col("qty") + 9000000L).as("qty")))
        table.deleteKeys(gen1.select("l_orderkey").filter(col("l_orderkey") % 4 === 0))
        table.compactAll()
        table.collectGarbage(nowMs = System.currentTimeMillis() + 11L * 60 * 1000)
        // the clone's pending marker still applies, then retires in ITS
        // compaction; pre/post reads must agree
        val pending = s.read.format("graft").load(s"$b/clone")
          .agg(sum(col("qty"))).as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        clone.compactAll()
        require(clone.store.tombstones.isEmpty, "clone compaction retires its markers")
        val folded = s.read.format("graft").load(s"$b/clone")
          .agg(sum(col("qty"))).as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
        require(pending == folded,
          s"clone pending read ($pending) != clone compacted read ($folded)")
        b
      })
      s.read.format("graft").load(s"$base/clone").orderBy("l_orderkey")
    },

    // S11 — continuous table→table replication, composed from the
    // engine's own primitives: first cycle = logical snapshot (LWW
    // resolved, pending markers suppressed — keys %9 stay deleted);
    // second cycle walks the manifests and resolves per key by commit
    // version: %7 keys update (re-inserting the %63 keys the snapshot
    // had deleted — LSM shadowing propagates), %5 keys delete. The
    // replica's txn watermark carries the last replicated SOURCE
    // version inside the merge commit itself — exactly-once with no
    // external offset store. The replica, not the source, is emitted.
    "s11_replication" -> withOracle(
      """WITH b1 AS (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |            FROM lineitem WHERE l_orderkey < 12000 GROUP BY 1)
        |SELECT l_orderkey,
        |       CASE WHEN l_orderkey % 7 = 0 THEN 7000000 + qty
        |            WHEN l_orderkey % 2 = 0 THEN 1000000 + qty
        |            ELSE qty END AS qty
        |FROM b1
        |WHERE l_orderkey % 5 <> 0 AND (l_orderkey % 9 <> 0 OR l_orderkey % 7 = 0)
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val base = replicaDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-repl-q").toString
        def mk(d: String) = GraftTable.create(s, d, schema,
          splitPoints = Seq(3000L, 6000L, 9000L),
          config = TableConfig(aggregationConfig = "last(qty)"))
        val src = mk(s"$b/src"); val dst = mk(s"$b/replica")
        val raw = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
        val gen1 = raw.groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("long")).as("qty"))
        src.ingest(gen1)
        src.ingest(gen1.filter(col("l_orderkey") % 2 === 0)
          .select(col("l_orderkey"), (col("qty") + 1000000L).as("qty")))
        src.deleteKeys(gen1.select("l_orderkey").filter(col("l_orderkey") % 9 === 0))
        val repl = new graft.jobs.Replication(src, dst)
        require(repl.runOnce() > 0, "snapshot cycle must apply")
        src.ingest(gen1.filter(col("l_orderkey") % 7 === 0)
          .select(col("l_orderkey"), (col("qty") + 7000000L).as("qty")))
        src.deleteKeys(gen1.select("l_orderkey").filter(col("l_orderkey") % 5 === 0))
        require(repl.runOnce() == 2L, "incremental cycle must apply 2 versions")
        require(repl.runOnce() == 0L, "caught up: replay is a no-op")
        // the replica must equal the source's resolved state exactly
        val sSum = src.toDF.agg(sum(col("qty")), count(lit(1))).head()
        val dSum = dst.toDF.agg(sum(col("qty")), count(lit(1))).head()
        require(sSum == dSum, s"replica diverged: src=$sSum dst=$dSum")
        b
      })
      s.read.format("graft").load(s"$base/replica").orderBy("l_orderkey")
    },

    // S10 — batch CDC between two table versions: batch 1 lands BEFORE
    // the captured window, then inside it batch 2 is ingested, keys
    // divisible by 11 are deleted, and compactAll runs. The feed must
    // report exactly batch 2 as inserts (the in-window compaction
    // output is dataChange=false and must NOT appear — its rows were
    // batch 1's) and the deleted keys as deletes EVEN THOUGH the same
    // compaction already retired the tombstones (the per-version
    // manifest walk catches adds that no endpoint snapshot holds). An
    // endpoint-diff implementation fails this row twice over.
    "s10_version_diff" -> withOracle(
      """SELECT 'insert' AS change_type, l_orderkey, CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem WHERE l_orderkey < 12000 AND l_linenumber >= 3
        |UNION ALL
        |SELECT 'delete' AS change_type, l_orderkey, CAST(NULL AS BIGINT) AS qty
        |FROM (SELECT DISTINCT l_orderkey FROM lineitem
        |      WHERE l_orderkey < 12000 AND l_orderkey % 11 = 0)
        |ORDER BY change_type, l_orderkey, qty NULLS FIRST""".stripMargin) { (s, dir) =>
      val (base, v1, v2) = cdcDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-cdc-q").toString
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(3000L, 6000L, 9000L))
        val raw = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
        def batch(f: org.apache.spark.sql.Column) = raw.filter(f)
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        table.ingest(batch(col("l_linenumber") <= 2))
        table.compactAll()
        val from = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
        table.ingest(batch(col("l_linenumber") >= 3))
        table.deleteKeys(raw.select(col("l_orderkey"))
          .filter(col("l_orderkey") % 11 === 0).distinct())
        table.compactAll()
        val to = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
        (s"$b/table", from, to)
      })
      val table = GraftTable.load(s, base)
      val ins = table.changesBetween(v1, v2)
        .select(lit("insert").as("change_type"), col("l_orderkey"), col("qty"))
      val del = table.deletedKeysBetween(v1, v2)
        .select(lit("delete").as("change_type"), col("l_orderkey"),
          lit(null).cast("long").as("qty"))
      ins.unionAll(del)
        .orderBy(col("change_type"), col("l_orderkey"), col("qty").asc_nulls_first)
    },

    "m11_add_column" -> withOracle(
      // M11 — schema evolution: a nullable value column appended between
      // two ingest batches (O(1) metadata — no data rewrite; the schema
      // versions THROUGH the transaction log with everything else).
      // Batch-1 files lack the column and every reader fills nulls;
      // batch-2 files carry values — the widening the reference's
      // fixed-schema tables cannot do, and the thing a year-old 100-TB
      // table inevitably needs. NULLS FIRST pinned on both sides (the
      // engines' ASC defaults differ).
      """SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS qty,
        |       CASE WHEN l_linenumber >= 3 THEN l_partkey % 7 END AS extra
        |FROM lineitem WHERE l_orderkey < 12000
        |ORDER BY 1, 2, 3 NULLS FIRST""".stripMargin) { (s, dir) =>
      val base = evolveDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-evolve-q").toString
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(3000L, 6000L, 9000L))
        val raw = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 12000)
        table.ingest(raw.filter(col("l_linenumber") <= 2)
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty")))
        table.addColumn(GraftField("extra", LongType, nullable = true))
        table.ingest(raw.filter(col("l_linenumber") >= 3)
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"),
            (col("l_partkey") % 7).cast("long").as("extra")))
        b
      })
      s.read.format("graft").load(s"$base/table")
        .orderBy(col("l_orderkey"), col("qty"), col("extra").asc_nulls_first)
    },

    "x11_files_report" -> withOracle(
      """SELECT CAST(4 AS BIGINT) AS leaf_partitions,
        |       CAST(3 AS BIGINT) AS nonleaf_partitions,
        |       CAST(4 AS BIGINT) AS files_referenced,
        |       CAST(0 AS BIGINT) AS files_awaiting_gc,
        |       CAST(4 AS BIGINT) AS n_references,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem WHERE l_orderkey < 12000""".stripMargin) { (s, dir) =>
      graft.reports.StatusReports.filesStatusDF(reportTable(s, dir))
    },

    // O7 — DESC TopN pushdown ("the latest keys"): ORDER BY key DESC
    // LIMIT n through the DSv2 surface. DESC NULLS LAST is the exact
    // REVERSE of the storage order, so each partition's DESC top-n is
    // its LAST n rows — an O(n) ring buffer per leaf instead of the
    // full-table sort a 100-TB "show me the newest" query would
    // otherwise pay; only leaves × n candidate rows reach Spark's
    // finishing sort. Asserts the push (the s9/p6/p7 pattern); oracle:
    // the plain DESC LIMIT (the driver compare is order-insensitive,
    // so top-100 SET equality is what's checked — event_id is unique,
    // making the set deterministic).
    "o7_last_page" -> withOracle(
      """SELECT event_id, user_id, event_type
        |FROM events
        |ORDER BY event_id DESC
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val base = statsSkipDirs.computeIfAbsent(dir, statsSkipBuilder(s, dir))
      val df = s.read.format("graft").load(s"$base/table")
        .orderBy(col("event_id").desc)
        .limit(100)
        .select("event_id", "user_id", "event_type")
      val desc = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.description()
      }.head
      require(desc.contains("perPartitionLimit=100 desc"),
        s"DESC TopN did not push: $desc")
      df
    },

    // O9 — MIXED-direction TopN pushdown: ORDER BY key ASC, sortkey
    // DESC LIMIT n. The storage order is full-ASC, so each leaf's merge
    // walks ASC-prefix groups keeping a bounded per-group heap under
    // the DESC tail and stops once n rows closed — O(n) memory, ~n rows
    // read per leaf, candidates finished by Spark's global sort. The
    // "per key, newest/biggest first" page shape (latest line items per
    // order, top score per user) that previously declined the push and
    // read everything. Asserts the push; oracle: the plain mixed ORDER
    // BY LIMIT ((l_orderkey, l_linenumber) is unique → deterministic).
    "o9_mixed_topn" -> withOracle(
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem
        |ORDER BY l_orderkey ASC, l_linenumber DESC
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val base = mixedTopDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-mixedtop").toString
        val rows = Tables(s, dir, "lineitem").select(
          col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity").cast("long").as("qty"))
        val schema = GraftSchema(
          rowKeys = Seq(GraftField("l_orderkey", LongType)),
          sortKeys = Seq(GraftField("l_linenumber", LongType)),
          values = Seq(GraftField("qty", LongType)))
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(30000L))
        // two overlapping batches: the TopN walk crosses a real merge
        table.ingest(rows.filter(col("l_linenumber") % 2 === 0))
        table.ingest(rows.filter(col("l_linenumber") % 2 === 1))
        b
      })
      val df = s.read.format("graft").load(s"$base/table")
        .orderBy(col("l_orderkey").asc, col("l_linenumber").desc)
        .limit(100)
        .select("l_orderkey", "l_linenumber", "qty")
      val desc = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.description()
      }.head
      require(desc.contains("perPartitionLimit=100 mixed=asc,desc"),
        s"mixed-direction TopN did not push: $desc")
      df
    },

    // O10 — LEADING-DESC mixed TopN pushdown: ORDER BY key DESC,
    // sortkey ASC LIMIT n — the "newest keys first, each key's rows in
    // order" pagination shape. Storage order delivers key groups in
    // REVERSE of the requested order, so each leaf's merge keeps the
    // LAST groups' per-group heaps in an O(n) deque (the mixed analog
    // of the all-DESC ring buffer); only ~2n candidates per leaf reach
    // Spark's finishing sort. Previously declined (read everything).
    // Asserts the push; (l_orderkey, l_linenumber) unique → the LIMIT
    // set is deterministic.
    "o10_mixed_topn_desc" -> withOracle(
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem
        |ORDER BY l_orderkey DESC, l_linenumber ASC
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val base = mixedTopDirs.computeIfAbsent(dir, { _ =>
        val b = java.nio.file.Files.createTempDirectory("graft-mixedtop").toString
        val rows = Tables(s, dir, "lineitem").select(
          col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity").cast("long").as("qty"))
        val schema = GraftSchema(
          rowKeys = Seq(GraftField("l_orderkey", LongType)),
          sortKeys = Seq(GraftField("l_linenumber", LongType)),
          values = Seq(GraftField("qty", LongType)))
        val table = GraftTable.create(s, s"$b/table", schema,
          splitPoints = Seq(30000L))
        table.ingest(rows.filter(col("l_linenumber") % 2 === 0))
        table.ingest(rows.filter(col("l_linenumber") % 2 === 1))
        b
      })
      val df = s.read.format("graft").load(s"$base/table")
        .orderBy(col("l_orderkey").desc, col("l_linenumber").asc)
        .limit(100)
        .select("l_orderkey", "l_linenumber", "qty")
      val desc = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.description()
      }.head
      require(desc.contains("perPartitionLimit=100 mixed=desc,asc"),
        s"leading-DESC mixed TopN did not push: $desc")
      df
    },

    "m10_jsonl_ingest" -> withOracle(
      """SELECT doc_id, text, lang FROM documents ORDER BY doc_id""") { (s, dir) =>
      val jsonlDir = jsonlDirs.computeIfAbsent(dir, { _ =>
        val base = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
        Tables(s, dir, "documents").select("doc_id", "text", "lang")
          .write.mode("overwrite").json(s"$base/in")
        val schema = GraftSchema(
          rowKeys = Seq(GraftField("doc_id", LongType)),
          sortKeys = Nil,
          values = Seq(
            GraftField("text", org.apache.spark.sql.types.StringType),
            GraftField("lang", org.apache.spark.sql.types.StringType)))
        val table = GraftTable.create(s, s"$base/table", schema)
        val back = s.read.schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id", LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("lang",
              org.apache.spark.sql.types.StringType))))
          .json(s"$base/in")
        table.ingest(back)
        base
      })
      GraftTable.load(s, s"$jsonlDir/table").toDF
        .select("doc_id", "text", "lang").orderBy("doc_id")
    },

    // T1 — continuous micro-batch ingest: two parquet files dropped into
    // an inbox across two batcher cycles land through the streaming sink
    // (checkpointed file source + idempotent txn commit), then the table
    // reads back as the same continual aggregation the oracle computes.
    "t1_streaming" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val table = streamingTable(s, dir)
      table.toDF.orderBy("l_orderkey")
    },

    // X4 — a query planned from the reference's JSON interchange form
    // (regions spelling; QuerySerDe) against the lifecycle table.
    "x4_query_json" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey >= 12000 AND l_orderkey < 18000
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val table = lifecycleTable(s, dir)
      val q = GraftQuery.fromJson(
        """{"queryId": "x4", "type": "Query",
           "regions": [ {"l_orderkey": {"min": 12000, "minInclusive": true,
                                        "max": 18000, "maxInclusive": false}} ]}""",
        schema)
      table.query(q).orderBy("l_orderkey")
    },

    // S2/DSv2 — spark.sql over the graft source; the BETWEEN pushes down
    // to regions that prune leaves before any file is opened, and the
    // scan's declared ordering spares the engine a sort.
    "s2_dsv2_pushdown" -> withOracle(
      """SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 5000 AND 20000
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val table = lifecycleTable(s, dir)
      s.read.format("graft").load(table.dir).createOrReplaceTempView("graft_lineitem")
      s.sql(
        """SELECT l_orderkey, qty FROM graft_lineitem
          |WHERE l_orderkey BETWEEN 5000 AND 20000
          |ORDER BY l_orderkey""".stripMargin)
    }
  )
}
