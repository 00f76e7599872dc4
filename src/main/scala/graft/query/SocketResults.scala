package graft.query

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue

/** A real network transport behind the [[ResultsQueue]] seam — the
  * in-repo counterpart of the reference's SQS/WebSocket result outputs
  * (reference: java/query/query-runner/.../output/SQSResultsOutput.java,
  * WebSocketResultsOutput.java): executors push result batches to a
  * results endpoint over TCP, one newline-terminated compact-JSON
  * message per batch (compact JSON carries no raw newlines, so the
  * framing is unambiguous).
  *
  * Semantics match the seam's documented contract exactly:
  *
  *  - **at-least-once**: `send` returns only after the consumer ACKs
  *    the line; any socket/ack failure throws, failing the Spark task,
  *    and the task RETRY re-sends every batch of that partition.
  *    "Sent" therefore means RECEIVED — a batch buffered in a dead
  *    socket is never silently counted.
  *  - **dedup keys**: batches re-sent by a retry carry the identical
  *    `(queryId, partitionId, batchSeq)` triple, so consumers
  *    deduplicate idempotently ([[SocketResultsConsumer.uniqueBatches]]
  *    is that fold, usable as the reference consumer).
  *
  * Connections are short-lived (one per batch): batches are already
  * size-bounded by `QueueResultsOutput.batchSize`, executors need no
  * shared connection state, and a mid-stream executor loss cannot leak
  * a half-open stream past its batch. A production deployment would
  * swap this class for an SQS/Kafka client behind the same seam.
  */
final class SocketResultsQueue(host: String, port: Int) extends ResultsQueue {
  override def send(message: String): Unit = {
    val s = new Socket(host, port)
    try {
      s.setSoTimeout(30000)
      val out = new BufferedWriter(new OutputStreamWriter(s.getOutputStream, UTF_8))
      out.write(message)
      out.write('\n')
      out.flush()
      if (s.getInputStream.read() != '+')
        throw new java.io.IOException(s"results endpoint $host:$port did not ack")
    } finally s.close()
  }
  override def toString: String = s"tcp://$host:$port"
}

/** The consuming end: accepts batch connections, ACKs each received
  * line, and exposes the raw wire messages plus the deduplicating fold
  * every consumer of the at-least-once transport needs. Test-grade by
  * design (a serving deployment terminates this in its queue service);
  * its value is making the seam's contract EXECUTABLE end-to-end —
  * executor → wire → ack → dedup — rather than only documented.
  */
final class SocketResultsConsumer extends AutoCloseable {
  private val server = new ServerSocket(0) // ephemeral port
  private val received = new ConcurrentLinkedQueue[String]()
  @volatile private var running = true

  val port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        // one short-lived connection per batch: read, record, ack
        val t = new Thread(() => handle(sock))
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () } // closed during accept
    }
  }, "socket-results-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit =
    try {
      sock.setSoTimeout(30000)
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
      val line = in.readLine()
      if (line != null) {
        received.add(line)
        sock.getOutputStream.write('+') // ack AFTER the line is recorded
        sock.getOutputStream.flush()
      }
    } catch { case _: Throwable => () } finally {
      try sock.close() catch { case _: Throwable => () }
    }

  /** Every message seen on the wire, duplicates included (what
    * at-least-once actually delivers under retries).
    */
  def rawMessages: Seq[String] = {
    val out = Seq.newBuilder[String]
    received.forEach(m => out += m)
    out.result()
  }

  override def close(): Unit = {
    running = false
    try server.close() catch { case _: Throwable => () }
  }
}

object SocketResultsConsumer {

  /** The consumer-side idempotent fold of the delivery contract: keep
    * the FIRST message per `(queryId, partitionId, batchSeq)` — retries
    * re-send byte-identical batches, so first-wins reconstructs the
    * exact result set from an at-least-once stream.
    */
  def uniqueBatches(messages: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[(String, Long, Long), String]
    messages.foreach { m =>
      try {
        val o = org.json4s.jackson.JsonMethods.parse(m)
          .asInstanceOf[org.json4s.JObject].obj.toMap
        val key = (
          o("queryId").asInstanceOf[org.json4s.JString].s,
          o("partitionId").asInstanceOf[org.json4s.JInt].num.toLong,
          o("batchSeq").asInstanceOf[org.json4s.JInt].num.toLong)
        if (!seen.contains(key)) seen(key) = m
      } catch { case scala.util.control.NonFatal(_) => () } // not a batch — drop
    }
    seen.values.toSeq
  }
}
