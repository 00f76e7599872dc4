package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The queue seam proven over a REAL transport: executors push result
  * batches over TCP with per-batch acks, a task retry re-sends its
  * partition's batches, and the consumer's dedup fold reconstructs the
  * exact result set — the at-least-once + dedup-key contract end-to-end
  * on the wire instead of only in memory.
  */
class SocketResultsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("socket delivery: all batches arrive over TCP and reassemble exactly") {
    val consumer = new SocketResultsConsumer
    try {
      val df = (1L to 100L).toDF("k").withColumn("v", col("k") * 10)
        .repartition(4)
      val out = new QueueResultsOutput(
        new SocketResultsQueue("127.0.0.1", consumer.port), batchSize = 7)
      val info = out.publish("q-tcp", df)
      assert(info.error.isEmpty, s"delivery error: ${info.error}")
      assert(info.rowCount == 100)

      val unique = SocketResultsConsumer.uniqueBatches(consumer.rawMessages)
      val rows = unique.flatMap { m =>
        val o = org.json4s.jackson.JsonMethods.parse(m)
          .asInstanceOf[org.json4s.JObject].obj.toMap
        o("rows").asInstanceOf[org.json4s.JArray].arr.map(r =>
          org.json4s.jackson.JsonMethods.compact(r))
      }
      assert(rows.size == 100)
      val ks = rows.flatMap(r => "\"k\":(\\d+)".r.findFirstMatchIn(r).map(_.group(1).toLong))
      assert(ks.toSet == (1L to 100L).toSet)
    } finally consumer.close()
  }

  test("injected task retry re-sends batches; consumer dedup reconstructs exactly") {
    val consumer = new SocketResultsConsumer
    try {
      // partition 0 dies AFTER 15 rows have flowed on its first attempt
      // — by then three 5-row batches are already acked on the wire
      // (mapPartitions pipelines into the sending task, so the throw
      // kills the task mid-send); the retry (local[4,2] grants one)
      // replays the partition from the repartition shuffle output
      val df = spark.range(100).as[Long]
        .repartition(4)
        .mapPartitions { it =>
          val tc = org.apache.spark.TaskContext.get()
          var n = 0
          it.map { k =>
            n += 1
            if (tc.partitionId() == 0 && tc.attemptNumber() == 0 && n == 16)
              throw new RuntimeException("injected task failure")
            k
          }
        }.toDF("k")
      val out = new QueueResultsOutput(
        new SocketResultsQueue("127.0.0.1", consumer.port), batchSize = 5)
      val info = out.publish("q-retry", df)
      assert(info.error.isEmpty, s"delivery error: ${info.error}")
      assert(info.rowCount == 100) // accumulator counts successful attempts only

      val raw = consumer.rawMessages
      val unique = SocketResultsConsumer.uniqueBatches(raw)
      assert(raw.size > unique.size,
        s"retry should have duplicated batches on the wire (raw=${raw.size}, unique=${unique.size})")
      val rows = unique.flatMap { m =>
        val o = org.json4s.jackson.JsonMethods.parse(m)
          .asInstanceOf[org.json4s.JObject].obj.toMap
        o("rows").asInstanceOf[org.json4s.JArray].arr.map(r =>
          org.json4s.jackson.JsonMethods.compact(r))
      }
      val ks = rows.flatMap(r => "\"k\":(\\d+)".r.findFirstMatchIn(r).map(_.group(1).toLong))
      assert(ks.size == 100, s"dedup must reconstruct exactly 100 rows, got ${ks.size}")
      assert(ks.toSet == (0L until 100L).toSet)
    } finally consumer.close()
  }

  test("a dead endpoint surfaces as a delivery error, not silence") {
    val dead = new SocketResultsConsumer
    val port = dead.port
    dead.close() // nothing listens here any more
    val out = new QueueResultsOutput(new SocketResultsQueue("127.0.0.1", port), batchSize = 5)
    val info = out.publish("q-dead", (1L to 10L).toDF("k"))
    assert(info.error.isDefined)
  }
}
