package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The queue seam over the WebSocket transport: RFC 6455 handshake +
  * framing between the JDK client (executors) and the in-repo server,
  * per-message acks, task-retry duplicates folded by the shared dedup,
  * and protocol-level checks (fragmentation, large frames, ping). The
  * same contract battery as SocketResultsSpec on a second real wire.
  */
class WebSocketResultsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("websocket delivery: all batches arrive and reassemble exactly") {
    val server = new WebSocketResultsServer
    try {
      val df = (1L to 100L).toDF("k").withColumn("v", col("k") * 10)
        .repartition(4)
      val out = new QueueResultsOutput(new WebSocketResultsQueue(server.url), batchSize = 7)
      val info = out.publish("q-ws", df)
      assert(info.error.isEmpty, s"delivery error: ${info.error}")
      assert(info.rowCount == 100)

      val unique = SocketResultsConsumer.uniqueBatches(server.rawMessages)
      val rows = unique.flatMap { m =>
        val o = org.json4s.jackson.JsonMethods.parse(m)
          .asInstanceOf[org.json4s.JObject].obj.toMap
        o("rows").asInstanceOf[org.json4s.JArray].arr.map(r =>
          org.json4s.jackson.JsonMethods.compact(r))
      }
      assert(rows.size == 100)
      val ks = rows.flatMap(r => "\"k\":(\\d+)".r.findFirstMatchIn(r).map(_.group(1).toLong))
      assert(ks.toSet == (1L to 100L).toSet)
    } finally server.close()
  }

  test("injected task retry duplicates fold back to the exact set") {
    val server = new WebSocketResultsServer
    try {
      val df = spark.range(60).as[Long]
        .repartition(4)
        .mapPartitions { it =>
          val tc = org.apache.spark.TaskContext.get()
          var n = 0
          it.map { k =>
            n += 1
            if (tc.partitionId() == 0 && tc.attemptNumber() == 0 && n == 11)
              throw new RuntimeException("injected task failure")
            k
          }
        }.toDF("k")
      val out = new QueueResultsOutput(new WebSocketResultsQueue(server.url), batchSize = 5)
      val info = out.publish("q-ws-retry", df)
      assert(info.error.isEmpty, s"delivery error: ${info.error}")
      val raw = server.rawMessages
      val unique = SocketResultsConsumer.uniqueBatches(raw)
      assert(raw.size > unique.size,
        s"retry should duplicate batches on the wire (raw=${raw.size}, unique=${unique.size})")
      val ks = unique.flatMap { m =>
        val o = org.json4s.jackson.JsonMethods.parse(m)
          .asInstanceOf[org.json4s.JObject].obj.toMap
        o("rows").asInstanceOf[org.json4s.JArray].arr.map(r =>
          org.json4s.jackson.JsonMethods.compact(r))
      }.flatMap(r => "\"k\":(\\d+)".r.findFirstMatchIn(r).map(_.group(1).toLong))
      assert(ks.size == 60 && ks.toSet == (0L until 60L).toSet)
    } finally server.close()
  }

  test("protocol: large frames (extended length) and client fragmentation survive") {
    val server = new WebSocketResultsServer
    try {
      // > 64 KiB payload forces the 8-byte (or at least 2-byte) extended
      // length path on both directions of the JDK client's framing
      val big = "x" * 200000
      new WebSocketResultsQueue(server.url).send(big)
      // explicit client-side fragmentation: two partial sendText calls
      val acked = new java.util.concurrent.CountDownLatch(1)
      val listener = new java.net.http.WebSocket.Listener {
        override def onText(ws: java.net.http.WebSocket, data: CharSequence,
            last: Boolean): java.util.concurrent.CompletionStage[_] = {
          if (data.toString == "+") acked.countDown()
          ws.request(1); null
        }
      }
      val ws = java.net.http.HttpClient.newHttpClient().newWebSocketBuilder()
        .buildAsync(java.net.URI.create(server.url), listener).join()
      ws.sendText("frag-first|", false).join()
      ws.sendText("frag-second", true).join()
      assert(acked.await(10, java.util.concurrent.TimeUnit.SECONDS), "no ack for fragmented message")
      ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "bye").join()

      val msgs = server.rawMessages
      assert(msgs.contains(big), "large frame must arrive intact")
      assert(msgs.contains("frag-first|frag-second"),
        s"fragments must reassemble into one message; got ${msgs.map(_.take(30))}")
    } finally server.close()
  }

  test("a dead endpoint surfaces as a delivery error, not silence") {
    val server = new WebSocketResultsServer
    val url = server.url
    server.close()
    val out = new QueueResultsOutput(new WebSocketResultsQueue(url), batchSize = 5)
    val info = out.publish("q-ws-dead", (1L to 10L).toDF("k"))
    assert(info.error.isDefined)
  }
}
