package graft.jobs

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions.{count, lit}
import graft.table.GraftTable

/** Out-of-process bulk export — the portable counterpart of the
  * reference's Python bulk-export path (reference:
  * python/src/sleeper/bulk_export.py submits `{"exportId", "tableName"}`
  * to the bulk-export SQS queue; the export runner writes the whole
  * table out). Here the same shape drives a `spark-submit`-able main:
  *
  *   spark-submit --class graft.jobs.BulkExportRunner graft.jar \
  *     <tableDir> <outBaseDir> [exportId]
  *
  * The full table (merged, sorted, aggregated — the M8 semantics of
  * GraftTable.export) lands at `<outBaseDir>/<exportId>/` as parquet,
  * written executor-parallel; the row count rides the write as an
  * observed metric (no second listing pass). Status JSON is written to
  * `<outBaseDir>/<exportId>.status.json` and printed as the last stdout
  * line: `{"exportId", "state": "COMPLETED"|"FAILED", "rowCount",
  * "location", "error"}`; exit 0 iff COMPLETED.
  */
object BulkExportRunner {

  def main(args: Array[String]): Unit = sys.exit(run(args))

  def run(args: Array[String]): Int = {
    if (args.length < 2 || args.length > 3) {
      System.err.println("usage: BulkExportRunner <tableDir> <outBaseDir> [exportId]")
      return 2
    }
    val Array(tableDir, outBase) = args.take(2)
    val exportId = args.lift(2).filter(_.matches("[A-Za-z0-9._-]+"))
      .getOrElse(java.util.UUID.randomUUID().toString)
    val dest = s"$outBase/$exportId"

    val spark = SparkSession.builder().appName("graft-bulk-export").getOrCreate()
    var state = "FAILED"
    var rows = 0L
    var error: Option[String] = None
    try {
      val table = GraftTable.load(spark, tableDir)
      val obs = Observation(s"graft-export-$exportId")
      table.toDF.observe(obs, count(lit(1)).as("rows"))
        .write.mode("overwrite").parquet(dest)
      rows = obs.get("rows").asInstanceOf[Long]
      state = "COMPLETED"
    } catch {
      case scala.util.control.NonFatal(e) =>
        error = Some(String.valueOf(e.getMessage))
    }
    val status =
      s"""{"exportId":${graft.Verify.jsonEscape(exportId)},"state":"$state",""" +
        s""""rowCount":$rows,"location":${graft.Verify.jsonEscape(dest)},""" +
        s""""error":${error.map(graft.Verify.jsonEscape).getOrElse("null")}}"""
    try graft.meta.GraftFS.writeString(s"$outBase/$exportId.status.json", status + "\n")
    catch { case scala.util.control.NonFatal(_) => () }
    println(status)
    if (state == "COMPLETED") 0 else 1
  }
}
