package graft.query

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.DataFrame

/** Where published results went (reference:
  * query-core/.../output/ResultsOutputLocation.java — kind + location,
  * e.g. ("DATA", s3 prefix) or ("SQS", queue url)).
  */
final case class ResultsOutputLocation(kind: String, location: String)

/** Outcome of publishing a query's results: rows delivered, where they
  * went, and the error if delivery died partway (reference:
  * query-core/.../output/ResultsOutputInfo.java).
  */
final case class ResultsOutputInfo(
    rowCount: Long,
    locations: Seq[ResultsOutputLocation],
    error: Option[Throwable] = None)

/** Destination for query results — the reference's serving-tier seam
  * (query-core/.../output/ResultsOutput.java, implemented there by
  * S3/SQS/WebSocket outputs). graft's equivalents are Spark-first:
  * [[FileResultsOutput]] writes the result plan straight to parquet
  * (every executor writes its partitions — nothing funnels through the
  * driver), and [[QueueResultsOutput]] pushes JSON row batches onto a
  * pluggable [[ResultsQueue]] from whichever executor holds each
  * partition.
  */
trait ResultsOutput {
  def publish(queryId: String, results: DataFrame): ResultsOutputInfo
}

/** S3/file results output (reference: S3ResultsOutput): one parquet
  * directory per query id under `baseDir`, written by the executors in
  * parallel. The row count rides the write itself as an observed
  * metric — no re-listing/footer pass over the written directory, which
  * on an object store would be a second round of LIST+HEAD calls.
  */
final class FileResultsOutput(baseDir: String) extends ResultsOutput {
  override def publish(queryId: String, results: DataFrame): ResultsOutputInfo = {
    val dir = s"$baseDir/$queryId"
    val loc = Seq(ResultsOutputLocation("DATA", dir))
    try {
      val obs = org.apache.spark.sql.Observation(s"graft-results-$queryId")
      results.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
        .write.mode("overwrite").parquet(dir)
      val n = obs.get("rows").asInstanceOf[Long]
      ResultsOutputInfo(n, loc)
    } catch {
      case scala.util.control.NonFatal(e) => ResultsOutputInfo(0, loc, Some(e))
    }
  }
}

/** Transport seam for pushed results (reference: the SQS client inside
  * SQSResultsOutput / the API-gateway client inside
  * WebSocketResultsOutput). Implementations must be serializable — the
  * queue ships into executor closures and each partition sends its own
  * batches; a real deployment backs this with an SQS/Kafka/WebSocket
  * client, tests use [[InMemoryResultsQueue]].
  */
trait ResultsQueue extends Serializable {
  def send(message: String): Unit
}

/** SQS/WebSocket-analog results output: rows serialize to JSON and leave
  * in batch messages
  * `{"queryId":…,"partitionId":p,"batchSeq":s,"rows":[…]}` (reference:
  * JSONResultsBatchSerialiser + SQSResultsOutput batch size). Delivery
  * is executor-side via `foreachPartition` — the driver never sees a
  * row; the count comes back through an accumulator.
  *
  * DELIVERY CONTRACT: at-least-once. A task that fails after sending
  * some batches re-sends them on retry (exactly the semantics of the
  * reference's SQS transport), while the accumulator counts each
  * SUCCESSFUL task exactly once — so `rowCount` is the exact result
  * size, and can legitimately differ from the number of rows a consumer
  * saw on the wire. Consumers deduplicate idempotently on the
  * `(queryId, partitionId, batchSeq)` triple, which is deterministic
  * per batch across retries of a partition.
  */
final class QueueResultsOutput(queue: ResultsQueue, batchSize: Int = 500,
    kind: String = "QUEUE") extends ResultsOutput {
  require(batchSize > 0, "batchSize must be positive")

  override def publish(queryId: String, results: DataFrame): ResultsOutputInfo = {
    val loc = Seq(ResultsOutputLocation(kind, queue.toString))
    val acc = results.sparkSession.sparkContext.longAccumulator(s"graft-results-$queryId")
    // the id is embedded in every message — escape it once, driver-side,
    // so an id containing quotes/backslashes cannot corrupt the JSON
    val idJson = graft.Verify.jsonEscape(queryId)
    val (q, bs) = (queue, batchSize)
    try {
      results.toJSON.foreachPartition { (it: Iterator[String]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var seq = 0
        val buf = new scala.collection.mutable.ArrayBuffer[String](bs)
        def flush(): Unit = if (buf.nonEmpty) {
          q.send(s"""{"queryId":$idJson,"partitionId":$pid,"batchSeq":$seq,""" +
            s""""rows":[${buf.mkString(",")}]}""")
          seq += 1
          buf.clear()
        }
        it.foreach { r => buf += r; acc.add(1); if (buf.size >= bs) flush() }
        flush()
      }
      ResultsOutputInfo(acc.value, loc)
    } catch {
      case scala.util.control.NonFatal(e) => ResultsOutputInfo(acc.value, loc, Some(e))
    }
  }
}

/** In-process queue keyed by name (the contract-test vehicle, like the
  * reference's localstack-backed output ITs). Works across executor
  * threads in local mode; a cluster deployment implements
  * [[ResultsQueue]] over a real transport instead.
  */
final class InMemoryResultsQueue(name: String) extends ResultsQueue {
  override def send(message: String): Unit = InMemoryResultsQueue.buffer(name).add(message)
  override def toString: String = s"memory://$name"
}

object InMemoryResultsQueue {
  private val queues = new ConcurrentHashMap[String, ConcurrentLinkedQueue[String]]()

  private[query] def buffer(name: String): ConcurrentLinkedQueue[String] =
    queues.computeIfAbsent(name, _ => new ConcurrentLinkedQueue[String]())

  /** Remove and return every message currently on the named queue. */
  def drain(name: String): Seq[String] = {
    val b = buffer(name)
    val out = Seq.newBuilder[String]
    var m = b.poll()
    while (m != null) { out += m; m = b.poll() }
    out.result()
  }
}
