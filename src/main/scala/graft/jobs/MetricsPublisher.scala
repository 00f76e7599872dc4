package graft.jobs

import org.apache.spark.sql.types.{LongType, StringType}

import graft.core.{GraftField, GraftSchema}
import graft.table.GraftTable

/** Metrics export seam — the reference publishes `TableMetrics` to
  * CloudWatch dashboards on a schedule (reference: java/metrics/src/main/
  * java/sleeper/metrics/TableMetricsLambda.java — a periodic job reading
  * the state store and pushing gauge values); here the time series lands
  * in a NORMAL graft table, so the dashboards are plain engine queries
  * (`ORDER BY ts`, windows over snapshots, joins against other tables)
  * and the history inherits compaction/retention like any other data.
  *
  * Shape: one snapshot row per (table_name, ts) — the table key — with
  * the A6 counters as long values. `averageFileReferencesPerPartition`
  * is intentionally decomposed into its RAW numerator/denominator
  * (`file_references`, `partitions_with_files`): the engine's value
  * types are integral (reference schema rules), the division is lossy,
  * and consumers can aggregate raw counts across snapshots correctly.
  *
  * Scheduling is the caller's trigger (cron, a streaming query's
  * foreachBatch, an ops loop): `publish` is the idempotent unit of work;
  * `start` wraps it in a daemon timer for embedded use.
  */
object MetricsPublisher {

  /** Schema of a metrics sink table: keyed by (table_name, ts) so many
    * source tables share one time-series table and snapshots read back
    * in time order per table.
    */
  val schema: GraftSchema = GraftSchema(
    rowKeys = Seq(GraftField("table_name", StringType)),
    sortKeys = Seq(GraftField("ts", LongType)),
    values = Seq(
      GraftField("file_count", LongType),
      GraftField("row_count", LongType),
      GraftField("partition_count", LongType),
      GraftField("leaf_partition_count", LongType),
      GraftField("file_references", LongType),
      GraftField("partitions_with_files", LongType)))

  /** Create a metrics sink table at `dir`. */
  def createTable(spark: org.apache.spark.sql.SparkSession, dir: String): GraftTable =
    GraftTable.create(spark, dir, schema)

  /** Record one snapshot of `source`'s state-store metrics into `sink`
    * under `name` — O(state store), zero data files read, one normal
    * ingest commit (so the snapshot is itself versioned/streamable).
    */
  def publish(source: GraftTable, sink: GraftTable, name: String,
      nowMs: Long = System.currentTimeMillis()): Unit = {
    val m = source.metrics
    val refs = source.store.fileReferences
    val spark = sink.spark
    import spark.implicits._
    sink.ingest(Seq((name, nowMs, m.fileCount.toLong, m.rowCount,
      m.partitionCount.toLong, m.leafPartitionCount.toLong,
      refs.size.toLong, refs.groupBy(_.partitionId).size.toLong))
      .toDF(schema.allFields.map(_.name): _*))
  }

  /** Periodic publishing for embedded use: a daemon thread snapshotting
    * each (name, tableDir) into `sink` every `intervalMs`. Returns a
    * closeable that stops the loop. Deployments with an external
    * scheduler should call [[publish]] from it instead.
    */
  def start(spark: org.apache.spark.sql.SparkSession,
      sources: Seq[(String, String)], sinkDir: String,
      intervalMs: Long): AutoCloseable = {
    @volatile var open = true
    val t = new Thread(() => {
      while (open) {
        try {
          val sink = GraftTable.load(spark, sinkDir)
          sources.foreach { case (name, dir) =>
            try publish(GraftTable.load(spark, dir), sink, name)
            catch { case scala.util.control.NonFatal(_) => () }
          }
        } catch { case scala.util.control.NonFatal(_) => () }
        val deadline = System.currentTimeMillis() + intervalMs
        while (open && System.currentTimeMillis() < deadline) Thread.sleep(25)
      }
    }, "graft-metrics-publisher")
    t.setDaemon(true)
    t.start()
    () => { open = false; t.join() }
  }
}
