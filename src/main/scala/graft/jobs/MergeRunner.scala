package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.table.GraftTable

/** Out-of-process MERGE INTO submission — the CDC-batch counterpart of
  * [[IngestRunner]]: a non-JVM client applies an upsert/delete batch
  * with nothing but the jar and a Spark distribution:
  *
  *   spark-submit --class graft.jobs.MergeRunner graft.jar \
  *     <tableDir> <jobJson | @jobJsonFile> [statusDir]
  *
  * Job JSON: `{"id": "...", "files": ["/path/a.parquet", ...],
  * "format": "parquet" | "jsonl", "opColumn": "_op",
  * "deleteOp": "delete"}` (opColumn/deleteOp default as shown; format
  * defaults to parquet). Files carry the table schema plus the op
  * column; rows whose op equals `deleteOp` become row-key delete
  * markers, the rest are put — ONE atomic Merge commit, exactly as
  * [[graft.table.GraftTable.merge]]. The job id doubles as the
  * exactly-once txn marker: resubmitting a committed id is a recorded
  * no-op (`DUPLICATE`).
  *
  * Status JSON (`<statusDir>/<id>.status.json` when statusDir is given,
  * always the last stdout line): `{"id", "state":
  * "COMMITTED"|"DUPLICATE"|"FAILED", "files", "putRows", "deleteKeys",
  * "error"}`; exit 0 iff not FAILED.
  */
object MergeRunner {

  private val TxnApp = "merge-job"

  def main(args: Array[String]): Unit = sys.exit(run(args))

  def run(args: Array[String]): Int = {
    if (args.length < 2 || args.length > 3) {
      System.err.println("usage: MergeRunner <tableDir> <jobJson | @jobJsonFile> [statusDir]")
      return 2
    }
    val tableDir = args(0)
    val json =
      if (args(1).startsWith("@")) graft.meta.GraftFS.readString(args(1).drop(1))
      else args(1)
    val m = JsonMethods.parse(json).asInstanceOf[JObject].obj.toMap
    def str(k: String, default: String): String =
      m.get(k).collect { case JString(s) => s }.getOrElse(default)
    val id = m.get("id").collect { case JString(s) => s }
      .filter(_.matches("[A-Za-z0-9._-]+"))
      .getOrElse(java.util.UUID.randomUUID().toString)
    val files = m.get("files").collect { case JArray(xs) =>
      xs.collect { case JString(s) => s }
    }.getOrElse(Nil)
    val format = str("format", "parquet")
    val opColumn = str("opColumn", "_op")
    val deleteOp = str("deleteOp", "delete")

    val spark = SparkSession.builder().appName("graft-merge-runner").getOrCreate()
    var state = "FAILED"
    var putRows = 0L
    var deleteKeys = 0L
    var error: Option[String] = None
    try {
      require(files.nonEmpty, "job JSON carries no files")
      val table = GraftTable.load(spark, tableDir)
      if (table.store.lastTxnVersion(s"$TxnApp-$id").exists(_ >= 1L)) state = "DUPLICATE"
      else {
        val srcSchema = org.apache.spark.sql.types.StructType(
          table.schema.toStructType.fields :+
            org.apache.spark.sql.types.StructField(opColumn,
              org.apache.spark.sql.types.StringType, nullable = true))
        val raw = format match {
          case "jsonl" => spark.read.schema(srcSchema).json(files: _*)
          case "parquet" => spark.read.parquet(files: _*)
          case other => sys.error(s"unknown merge format: $other")
        }
        val df = raw.select((table.schema.allFields.map(f =>
          col(f.name).cast(f.dataType).as(f.name)) :+ col(opColumn)): _*)
        val (puts, tombs) = table.merge(df, col(opColumn) === deleteOp,
          txn = Some((s"$TxnApp-$id", 1L)))
        putRows = puts.map(_.rowCount).sum
        deleteKeys = tombs.map(_.rowCount).sum
        state = "COMMITTED"
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        error = Some(String.valueOf(e.getMessage))
    }
    val status =
      s"""{"id":${graft.Verify.jsonEscape(id)},"state":"$state","files":${files.size},""" +
        s""""putRows":$putRows,"deleteKeys":$deleteKeys,""" +
        s""""error":${error.map(graft.Verify.jsonEscape).getOrElse("null")}}"""
    if (args.length == 3) {
      try graft.meta.GraftFS.writeString(s"${args(2)}/$id.status.json", status + "\n")
      catch { case scala.util.control.NonFatal(_) => () }
    }
    println(status)
    if (state == "FAILED") 1 else 0
  }
}
