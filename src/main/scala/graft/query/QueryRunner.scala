package graft.query

import org.apache.spark.sql.SparkSession
import graft.table.GraftTable

/** Out-of-process query submission — the reference's JSON-over-queue
  * path (query submission via JSON to SQS, executed by the lambda/EMR
  * query runner: java/query/query-runner, docs/usage/query.md), here as
  * a `spark-submit`-able main over the same interchange JSON that
  * QuerySerDe round-trips (x4): a non-JVM client writes the reference's
  * query JSON, submits this main, and collects parquet results plus a
  * machine-readable status file, without linking against the library.
  *
  *   spark-submit --class graft.query.QueryRunner graft.jar \
  *     <tableDir> <queryJson | @queryJsonFile> <outDir> [trackerDir]
  *
  * Results land at `<outDir>/<queryId>/` (parquet, executor-parallel);
  * the terminal tracker state is written to
  * `<outDir>/<queryId>.status.json` and printed as the last stdout
  * line. Exit code 0 iff the query COMPLETED and delivery succeeded.
  *
  * With the optional `trackerDir`, the full QUEUED → IN_PROGRESS →
  * terminal lifecycle also lands in a durable [[FileQueryTracker]]
  * there, so a separate process (a polling client, a dashboard) watches
  * the query LIVE across JVMs — the reference's DynamoDB query tracker
  * role — instead of only reading the terminal status file afterwards.
  */
object QueryRunner {

  def main(args: Array[String]): Unit = sys.exit(run(args))

  def run(args: Array[String]): Int = {
    // --ws=<url>: publish result batches to a WebSocket endpoint (the
    // reference's WebSocket query consumption shape — python clients
    // stand up the endpoint and fold the pushed batches) instead of
    // writing parquet. The status file still lands under <outDir>.
    val wsUrl = args.collectFirst { case a if a.startsWith("--ws=") => a.drop(5) }
    // --as-of=<version>: run the query against the table AS OF a
    // state-store version (time travel; capture versions via
    // `AdminRunner version`). Readable while the snapshot chain retains
    // the version and GC has not deleted its files.
    val asOf = args.collectFirst { case a if a.startsWith("--as-of=") => a.drop(8).toLong }
    val positional = args.filterNot(_.startsWith("--"))
    if (positional.length < 3 || positional.length > 4) {
      System.err.println(
        "usage: QueryRunner <tableDir> <queryJson | @queryJsonFile> <outDir> " +
          "[trackerDir] [--ws=<url>] [--as-of=<version>]")
      return 2
    }
    val Array(tableDir, queryArg, outDir) = positional.take(3)
    // Hadoop FS, not java.nio: both the query file and the results dir
    // may live on any scheme (file://, hdfs://, an object store)
    val json =
      if (queryArg.startsWith("@")) graft.meta.GraftFS.readString(queryArg.drop(1))
      else queryArg

    val spark = SparkSession.builder()
      .appName("graft-query-runner")
      .getOrCreate() // master/conf come from spark-submit (or the test session)

    val table = asOf match {
      case Some(v) => GraftTable.loadAsOf(spark, tableDir, v)
      case None => GraftTable.load(spark, tableDir)
    }
    val q = GraftQuery.fromJson(json, table.schema)
    val queryId = queryIdOf(json)

    val tracker: QueryTrackerStore =
      if (positional.length == 4) new FileQueryTracker(positional(3))
      else new InMemoryQueryTracker
    val exec = new TrackedQueryExecutor(table, tracker)
    val output: ResultsOutput = wsUrl match {
      case Some(url) =>
        new QueueResultsOutput(new WebSocketResultsQueue(url), kind = "WEBSOCKET")
      case None => new FileResultsOutput(outDir)
    }
    val info =
      try exec.publish(queryId, q, output)
      catch { case scala.util.control.NonFatal(_) =>
        ResultsOutputInfo(0, Nil, None) // tracker already holds FAILED + message
      }
    val state = exec.tracker.get(queryId).map(_.state).getOrElse(QueryState.Failed)
    val err = exec.tracker.get(queryId).flatMap(_.errorMessage)
      .orElse(info.error.map(e => String.valueOf(e.getMessage)))

    val status =
      s"""{"queryId":${graft.Verify.jsonEscape(queryId)},"state":"$state",""" +
        s""""rowCount":${info.rowCount},"locations":[${info.locations.map(l =>
          s"""{"kind":${graft.Verify.jsonEscape(l.kind)},"location":${graft.Verify.jsonEscape(l.location)}}""").mkString(",")}],""" +
        s""""error":${err.map(graft.Verify.jsonEscape).getOrElse("null")}}"""
    try graft.meta.GraftFS.writeString(s"$outDir/$queryId.status.json", status + "\n")
    catch { case scala.util.control.NonFatal(_) => () }
    println(status)
    if (state == QueryState.Completed && err.isEmpty) 0 else 1
  }

  /** The interchange JSON's queryId, else a fresh one. The id is caller
    * supplied and interpolated into filesystem paths (`<outDir>/<id>/`,
    * `<outDir>/<id>.status.json`), so it must not carry path separators
    * or dot-dot segments — anything outside a safe charset falls back to
    * a fresh UUID, like the reference's generated query ids.
    */
  private val SafeQueryId = "[A-Za-z0-9._-]+".r
  private def queryIdOf(json: String): String =
    try {
      org.json4s.jackson.JsonMethods.parse(json) match {
        case o: org.json4s.JObject =>
          o.obj.toMap.get("queryId") match {
            case Some(org.json4s.JString(id))
                if SafeQueryId.matches(id.trim) && id.trim != "." && id.trim != ".." =>
              id.trim
            case _ => java.util.UUID.randomUUID().toString
          }
        case _ => java.util.UUID.randomUUID().toString
      }
    } catch { case scala.util.control.NonFatal(_) => java.util.UUID.randomUUID().toString }
}
