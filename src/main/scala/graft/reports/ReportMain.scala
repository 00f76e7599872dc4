package graft.reports

import org.apache.spark.sql.SparkSession
import graft.jobs.FileCompactionJobTracker
import graft.query.FileQueryTracker
import graft.table.GraftTable

/** Admin report CLI (reference: the `clients report` command family —
  * java/clients/src/main/java/sleeper/clients/report/StatusReport.java
  * and its per-report mains). Reads ONLY metadata (state store + file
  * trackers), so it is cheap against any table size.
  *
  * {{{
  *   runMain graft.reports.ReportMain <tableDir> [report...]
  *     report: files | files-verbose | partitions | ingest |
  *             compactions[=<trackerDir>] | queries[=<trackerDir>] | full
  *     (default: files partitions ingest; tracker dirs default to
  *      <tableDir>/trackers/{compactions,queries} when present)
  * }}}
  */
object ReportMain {

  def render(spark: SparkSession, tableDir: String, reports: Seq[String]): String = {
    val table = GraftTable.load(spark, tableDir)
    def compTracker(dir: Option[String]) =
      new FileCompactionJobTracker(dir.getOrElse(s"$tableDir/trackers/compactions"))
    def queryTracker(dir: Option[String]) =
      new FileQueryTracker(dir.getOrElse(s"$tableDir/trackers/queries"))
    val wanted = if (reports.isEmpty) Seq("files", "partitions", "ingest") else reports
    wanted.map { r =>
      val (name, arg) = r.split("=", 2) match {
        case Array(n, a) => (n, Some(a))
        case Array(n) => (n, None)
      }
      name match {
        case "files" => StatusReports.filesStatus(table)
        case "files-verbose" => StatusReports.filesStatus(table, verbose = true)
        case "partitions" => StatusReports.partitionsStatus(table)
        case "ingest" => StatusReports.ingest(table)
        case "compactions" => StatusReports.compactionJobs(compTracker(arg))
        case "queries" => StatusReports.queries(queryTracker(arg))
        case "full" =>
          StatusReports.full(table, compTracker(None), queryTracker(None))
        case other => sys.error(s"unknown report: $other")
      }
    }.mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ReportMain <tableDir> [report...]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[2]"))
      .appName("graft-reports")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try println(render(spark, args.head, args.tail.toSeq))
    finally spark.stop()
  }
}
