package graft.query

import java.net.{ServerSocket, Socket, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, LinkedBlockingQueue, TimeUnit}

/** WebSocket results transport — the in-repo counterpart of the
  * reference's WebSocket result output (reference:
  * java/query/query-runner/src/main/java/sleeper/query/runner/output/WebSocketResultsOutput.java,
  * which pushes result batches to API Gateway WebSocket connections).
  * Same [[ResultsQueue]] seam and the same delivery contract as the TCP
  * transport ([[SocketResultsQueue]]):
  *
  *  - **at-least-once**: `send` returns only after the consumer ACKs
  *    the message with a `+` text frame; a missing ack throws, the
  *    Spark task fails, and the retry re-sends the partition's batches.
  *  - **dedup keys**: re-sent batches carry the identical
  *    `(queryId, partitionId, batchSeq)` triple —
  *    [[SocketResultsConsumer.uniqueBatches]] is the consumer fold.
  *
  * The CLIENT is the JDK's own `java.net.http.WebSocket` (RFC 6455
  * handshake, masking, and framing come from the platform); one
  * connection per batch, like the TCP transport — executors stay
  * stateless and a lost executor cannot leak a half-open stream. The
  * SERVER half ([[WebSocketResultsServer]]) implements the RFC 6455
  * upgrade and frame decode directly over a ServerSocket, standing in
  * for the managed endpoint (API Gateway in the reference) the same way
  * HttpCasServer stands in for DynamoDB.
  */
final class WebSocketResultsQueue(url: String) extends ResultsQueue {
  override def send(message: String): Unit = {
    val acked = new CountDownLatch(1)
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val listener = new java.net.http.WebSocket.Listener {
      private val buf = new StringBuilder
      override def onText(ws: java.net.http.WebSocket, data: CharSequence,
          last: Boolean): java.util.concurrent.CompletionStage[_] = {
        buf.append(data)
        if (last) {
          if (buf.toString == "+") acked.countDown()
          buf.clear()
        }
        ws.request(1)
        null
      }
      override def onError(ws: java.net.http.WebSocket, error: Throwable): Unit =
        failed.set(error)
    }
    val client = java.net.http.HttpClient.newHttpClient()
    val ws = client.newWebSocketBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .buildAsync(URI.create(url), listener)
      .join()
    try {
      ws.sendText(message, true).join()
      if (!acked.await(30, TimeUnit.SECONDS)) {
        val e = failed.get()
        throw new java.io.IOException(
          s"websocket endpoint $url did not ack" + (if (e != null) s": $e" else ""))
      }
    } finally {
      try ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done")
        .orTimeout(5, TimeUnit.SECONDS).join()
      catch { case _: Throwable => () }
      try ws.abort() catch { case _: Throwable => () }
    }
  }
  override def toString: String = url
}

/** Server half: RFC 6455 over a raw ServerSocket — HTTP upgrade
  * (Sec-WebSocket-Accept = base64(SHA-1(key + GUID))), masked
  * client-frame decode with continuation support, `+` text-frame ack
  * AFTER the message is recorded, pong for ping, close for close.
  * Test-grade by design; a deployment terminates WS in its managed
  * gateway. Exposes the same consumer surface as
  * [[SocketResultsConsumer]] so the dedup fold is shared.
  */
final class WebSocketResultsServer extends AutoCloseable {
  private val server = new ServerSocket(0)
  private val received = new ConcurrentLinkedQueue[String]()
  @volatile private var running = true

  val port: Int = server.getLocalPort
  val url: String = s"ws://127.0.0.1:$port/results"

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock))
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () } // closed during accept
    }
  }, "ws-results-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit =
    try {
      sock.setSoTimeout(30000)
      val in = sock.getInputStream
      val out = sock.getOutputStream

      // ---- HTTP upgrade ----
      val reqLines = Iterator.continually {
        val sb = new StringBuilder
        var c = in.read()
        while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
        sb.toString
      }.takeWhile(_.nonEmpty).toList
      val key = reqLines.collectFirst {
        case l if l.toLowerCase.startsWith("sec-websocket-key:") =>
          l.substring(l.indexOf(':') + 1).trim
      }.getOrElse(throw new java.io.IOException("no Sec-WebSocket-Key"))
      val accept = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-1")
          .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
      out.flush()

      // ---- frame loop ----
      def readFully(n: Int): Array[Byte] = {
        val b = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(b, off, n - off)
          if (r < 0) throw new java.io.EOFException("peer closed mid-frame")
          off += r
        }
        b
      }
      val textBuf = new java.io.ByteArrayOutputStream()
      var open = true
      while (open) {
        val b0 = in.read()
        if (b0 < 0) open = false
        else {
          val fin = (b0 & 0x80) != 0
          val opcode = b0 & 0x0f
          val b1 = in.read()
          if (b1 < 0) throw new java.io.EOFException("truncated frame header")
          val masked = (b1 & 0x80) != 0
          var len: Long = b1 & 0x7f
          if (len == 126) {
            val e = readFully(2)
            len = ((e(0) & 0xff) << 8) | (e(1) & 0xff)
          } else if (len == 127) {
            val e = readFully(8)
            len = e.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xff))
          }
          require(len <= 64 * 1024 * 1024, s"frame too large: $len")
          val mask = if (masked) readFully(4) else Array.empty[Byte]
          val payload = readFully(len.toInt)
          if (masked) {
            var i = 0
            while (i < payload.length) { payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
          }
          opcode match {
            case 0x1 | 0x0 => // text / continuation
              textBuf.write(payload)
              if (fin) {
                received.add(new String(textBuf.toByteArray, UTF_8))
                textBuf.reset()
                writeFrame(out, 0x1, "+".getBytes(UTF_8)) // ack AFTER recording
              }
            case 0x8 => // close: echo and finish
              writeFrame(out, 0x8, payload)
              open = false
            case 0x9 => writeFrame(out, 0xA, payload) // ping -> pong
            case _ => () // pong / reserved: ignore
          }
        }
      }
    } catch { case _: Throwable => () } finally {
      try sock.close() catch { case _: Throwable => () }
    }

  /** Server frames are unmasked per RFC 6455. */
  private def writeFrame(out: java.io.OutputStream, opcode: Int, payload: Array[Byte]): Unit =
    out.synchronized {
      out.write(0x80 | opcode)
      if (payload.length < 126) out.write(payload.length)
      else if (payload.length < 65536) {
        out.write(126); out.write(payload.length >> 8); out.write(payload.length & 0xff)
      } else {
        out.write(127)
        var i = 7
        while (i >= 0) { out.write(((payload.length.toLong >> (8 * i)) & 0xff).toInt); i -= 1 }
      }
      out.write(payload)
      out.flush()
    }

  /** Every message seen on the wire, duplicates included. */
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
