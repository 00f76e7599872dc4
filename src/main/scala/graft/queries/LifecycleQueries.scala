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

  val defs: Map[String, QueryDef] = Map(

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

    // X1 — config-string transform at query time over the lifecycle
    // table: a CapValue{qty,77} transform caps the aggregated quantity,
    // reproduced in the oracle as LEAST over the same grouping.
    "x1_transform" -> withOracle(
      """SELECT l_orderkey,
        |       CAST(LEAST(SUM(CAST(l_quantity AS BIGINT)), 77) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey >= 20000 AND l_orderkey < 30000
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val table = lifecycleTable(s, dir)
      table.query(graft.query.GraftQuery(
          regions = Seq(Region(KeyRange.minMax("l_orderkey", 20000L, 30000L))),
          queryTransformConfig = Some("graft.transforms.CapValue{qty,77}")))
        .orderBy("l_orderkey")
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
