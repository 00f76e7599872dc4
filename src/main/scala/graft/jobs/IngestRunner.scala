package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.table.GraftTable

/** Out-of-process ingest submission — the portable counterpart of the
  * reference's Python ingest path (reference:
  * python/src/sleeper/ingest.py submits `{"id", "files", ...}` job JSON
  * to the ingest SQS queue; java/ingest picks it up). Here the same job
  * JSON drives a `spark-submit`-able main, so a non-JVM client ingests
  * files with nothing but the jar and a Spark distribution:
  *
  *   spark-submit --class graft.jobs.IngestRunner graft.jar \
  *     <tableDir> <jobJson | @jobJsonFile> [statusDir]
  *
  * Job JSON: `{"id": "...", "files": ["/path/a.parquet", ...],
  * "format": "parquet" | "jsonl"}` (format defaults to parquet; jsonl
  * reads against the table schema, the reference's ingest-anything
  * contract). The job id doubles as the table's exactly-once txn
  * marker: resubmitting a committed job id is a recorded no-op
  * (`DUPLICATE`), the queue-redelivery semantics the reference gets
  * from its idempotent job tracker.
  *
  * Status JSON (`<statusDir>/<id>.status.json` when statusDir is given,
  * always the last stdout line):
  * `{"id", "state": "COMMITTED"|"DUPLICATE"|"FAILED", "files", "rows",
  * "error"}`; exit 0 iff not FAILED.
  */
object IngestRunner {

  private val TxnApp = "ingest-job"

  def main(args: Array[String]): Unit = sys.exit(run(args))

  def run(args: Array[String]): Int = {
    if (args.length < 2 || args.length > 3) {
      System.err.println("usage: IngestRunner <tableDir> <jobJson | @jobJsonFile> [statusDir]")
      return 2
    }
    val tableDir = args(0)
    val json =
      if (args(1).startsWith("@")) graft.meta.GraftFS.readString(args(1).drop(1))
      else args(1)
    val m = JsonMethods.parse(json).asInstanceOf[JObject].obj.toMap
    val id = m.get("id").collect { case JString(s) => s }
      .filter(_.matches("[A-Za-z0-9._-]+"))
      .getOrElse(java.util.UUID.randomUUID().toString)
    val files = m.get("files").collect { case JArray(xs) =>
      xs.collect { case JString(s) => s }
    }.getOrElse(Nil)
    val format = m.get("format").collect { case JString(s) => s }.getOrElse("parquet")

    val spark = SparkSession.builder().appName("graft-ingest-runner").getOrCreate()
    var state = "FAILED"
    var rows = 0L
    var error: Option[String] = None
    try {
      require(files.nonEmpty, "job JSON carries no files")
      val table = GraftTable.load(spark, tableDir)
      // per-job txn version 1: the job id IS the idempotency key
      if (table.store.lastTxnVersion(s"$TxnApp-$id").exists(_ >= 1L)) state = "DUPLICATE"
      else {
        val raw = format match {
          case "jsonl" => spark.read.schema(table.schema.toStructType).json(files: _*)
          case "parquet" => spark.read.parquet(files: _*)
          case other => sys.error(s"unknown ingest format: $other")
        }
        // project to schema order with schema types — ingest validates the rest
        val df = raw.select(table.schema.allFields.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
        val refs = table.ingest(df, txn = Some((s"$TxnApp-$id", 1L)))
        rows = refs.map(_.rowCount).sum
        state = "COMMITTED"
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        error = Some(String.valueOf(e.getMessage))
    }
    val status =
      s"""{"id":${graft.Verify.jsonEscape(id)},"state":"$state","files":${files.size},""" +
        s""""rows":$rows,"error":${error.map(graft.Verify.jsonEscape).getOrElse("null")}}"""
    if (args.length == 3) {
      try graft.meta.GraftFS.writeString(s"${args(2)}/$id.status.json", status + "\n")
      catch { case scala.util.control.NonFatal(_) => () }
    }
    println(status)
    if (state == "FAILED") 1 else 0
  }
}
