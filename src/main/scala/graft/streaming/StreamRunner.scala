package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Out-of-process streaming surfaces — the spark-submit reach into the
  * engine's two native streaming endpoints for non-JVM clients (the
  * Python `graft_client.streaming` module), mirroring the AdminRunner
  * transport contract (process invocation + file IO + a status JSON):
  *
  *   spark-submit --class graft.streaming.StreamRunner graft.jar \
  *     feed <tableDir> <outDir> <checkpointDir> [statusDir]
  *   spark-submit --class graft.streaming.StreamRunner graft.jar \
  *     sink <tableDir> <inboxDir> <checkpointDir> [statusDir]
  *
  * `feed` drains the streaming change-data-feed (t47 —
  * `readChangeFeed`: puts AND row-key deletes with _op /
  * _commit_version / _commit_seq) up to the table's CURRENT version
  * into parquet under `outDir` (Trigger.AvailableNow). The client owns
  * `checkpointDir`: re-invoking with the same checkpoint resumes from
  * the last drained version — an exactly-once incremental consumer in
  * repeated subprocess calls.
  *
  * `sink` streams parquet files from `inboxDir` into the table through
  * the NATIVE structured-streaming sink (t48 — exactly-once epochs
  * under the (sink:queryId, epochId) watermark, shared root-homed
  * files, spill-bounded writers). Files appearing between invocations
  * are picked up exactly once (file-source checkpoint). The stream's
  * queryId is pinned from the checkpoint, so replays are no-ops.
  *
  * Status JSON (`<statusDir>/<op>.status.json` + last stdout line):
  * `{"op", "state": "OK"|"FAILED", "endVersion"|..., "error"}`.
  */
object StreamRunner {

  def main(args: Array[String]): Unit = sys.exit(run(args))

  def run(args: Array[String]): Int = {
    if (args.length < 4) {
      System.err.println(
        "usage: StreamRunner feed <tableDir> <outDir> <checkpointDir> [statusDir] | " +
          "sink <tableDir> <inboxDir> <checkpointDir> [statusDir]")
      return 2
    }
    args(0) match {
      case "feed" => runFeed(args)
      case "sink" => runSink(args)
      case other => System.err.println(s"unknown stream command: $other"); 2
    }
  }

  private def runFeed(args: Array[String]): Int = {
    val Array(_, tableDir, outDir, checkpointDir) = args.take(4)
    val statusDir = if (args.length > 4) Some(args(4)) else None
    val spark = SparkSession.builder().appName("graft-stream-feed").getOrCreate()
    var state = "FAILED"
    var endVersion = 0L
    var error: Option[String] = None
    try {
      StreamTuning.tune(spark, Some(checkpointDir))
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(tableDir)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpointDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      endVersion = graft.meta.JsonStateStore.latestVersionIn(s"$tableDir/meta").getOrElse(0L)
      state = "OK"
    } catch {
      case scala.util.control.NonFatal(e) =>
        error = Some(String.valueOf(Option(e.getMessage).getOrElse(e.toString)))
    }
    finish(statusDir, "feed",
      s"""{"op":"feed","state":"$state","endVersion":$endVersion,""" +
        s""""error":${error.map(graft.Verify.jsonEscape).getOrElse("null")}}""", state)
  }

  private def runSink(args: Array[String]): Int = {
    val Array(_, tableDir, inboxDir, checkpointDir) = args.take(4)
    val statusDir = if (args.length > 4) Some(args(4)) else None
    val spark = SparkSession.builder().appName("graft-stream-sink").getOrCreate()
    var state = "FAILED"
    var endVersion = 0L
    var error: Option[String] = None
    try {
      val schema = graft.meta.JsonStateStore.load(s"$tableDir/meta").schema
      val st = org.apache.spark.sql.types.StructType(schema.allFields.map(f =>
        org.apache.spark.sql.types.StructField(f.name, f.dataType, f.nullable)))
      graft.meta.GraftFS.mkdirs(inboxDir)
      StreamTuning.tune(spark, Some(checkpointDir))
      val q = spark.readStream.schema(st).parquet(inboxDir)
        .writeStream.format("graft")
        .option("path", tableDir)
        .option("checkpointLocation", checkpointDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      endVersion = graft.meta.JsonStateStore.latestVersionIn(s"$tableDir/meta").getOrElse(0L)
      state = "OK"
    } catch {
      case scala.util.control.NonFatal(e) =>
        error = Some(String.valueOf(Option(e.getMessage).getOrElse(e.toString)))
    }
    finish(statusDir, "sink",
      s"""{"op":"sink","state":"$state","endVersion":$endVersion,""" +
        s""""error":${error.map(graft.Verify.jsonEscape).getOrElse("null")}}""", state)
  }

  private def finish(statusDir: Option[String], op: String, status: String,
      state: String): Int = {
    statusDir.foreach { d =>
      try graft.meta.GraftFS.writeString(s"$d/$op.status.json", status)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    println(status)
    if (state == "FAILED") 1 else 0
  }
}
