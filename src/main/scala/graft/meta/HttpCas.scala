package graft.meta

import java.net.{InetSocketAddress, URI, URLDecoder, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Remote conditional-put [[ClaimStore]] over HTTP — the
  * production-shaped external CAS an object-store deployment needs (the
  * reference's DynamoDB transaction log plays exactly this role:
  * reference docs/design/transaction-log-state-store.md,
  * java/core/.../statestore/transactionlog/ — a remote store whose only
  * required primitive is an atomic put-if-absent). Protocol, rooted at
  * `baseUrl` (e.g. `http://cas-host:8080/claims`):
  *
  *   PUT    {base}/{name}  body=uuid  → 201 created | 409 already claimed
  *   GET    {base}/{name}             → 200 uuid    | 404
  *   DELETE {base}/{name}             → 204
  *   GET    {base}                    → 200, lines of `name\tuuid`
  *
  * Every response other than the expected pair throws: a claim PUT that
  * cannot reach the arbiter must FAIL the commit (the caller retries),
  * never guess — guessing either way risks a lost update.
  *
  * Wrapped by [[HttpCas]] into the staged/claim/fill commit protocol of
  * [[ClaimArbitratedCAS]]; served by [[HttpCasServer]] (a durable
  * single-node stand-in for the managed service).
  */
final class HttpClaimStore(baseUrl: String) extends ClaimStore {
  private val base = baseUrl.stripSuffix("/")
  private val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  private def uri(name: String): URI =
    URI.create(s"$base/${URLEncoder.encode(name, UTF_8)}")

  private def send(req: HttpRequest): HttpResponse[String] =
    client.send(req, HttpResponse.BodyHandlers.ofString())

  override def tryClaim(name: String, uuid: String): Boolean =
    send(HttpRequest.newBuilder(uri(name))
        .PUT(HttpRequest.BodyPublishers.ofString(uuid, UTF_8)).build())
      .statusCode() match {
        case 201 => true
        case 409 => false
        case c => throw new java.io.IOException(s"claim PUT $name → HTTP $c")
      }

  override def readClaim(name: String): Option[String] = {
    val r = send(HttpRequest.newBuilder(uri(name)).GET().build())
    r.statusCode() match {
      case 200 => Some(r.body()).filter(_.nonEmpty)
      case 404 => None
      case c => throw new java.io.IOException(s"claim GET $name → HTTP $c")
    }
  }

  override def deleteClaim(name: String): Unit = {
    val c = send(HttpRequest.newBuilder(uri(name)).DELETE().build()).statusCode()
    if (c != 204 && c != 404) throw new java.io.IOException(s"claim DELETE $name → HTTP $c")
  }

  override def listClaims(): Seq[(String, String)] = {
    val r = send(HttpRequest.newBuilder(URI.create(base)).GET().build())
    if (r.statusCode() != 200) throw new java.io.IOException(s"claim LIST → HTTP ${r.statusCode()}")
    r.body().split("\n").toSeq.filter(_.nonEmpty).flatMap { line =>
      line.split("\t", 2) match {
        case Array(n, u) => Some(n -> u)
        case _ => None
      }
    }
  }
}

/** The external conditional-put CAS for object-store tables: the
  * [[ClaimArbitratedCAS]] stage/claim/fill protocol with arbitration on
  * a remote HTTP claim service — the drop-in the
  * `GraftFS.casFor` object-store refusal asks for.
  */
final class HttpCas(baseUrl: String)
  extends ClaimArbitratedCAS(new HttpClaimStore(baseUrl))

/** Remote-commit client for the committer-as-a-service endpoint
  * ([[HttpCasServer]] `/commit`): POSTs ONE serialized transaction and
  * blocks until the service's batched committer has durably landed (or
  * individually rejected) it. N client PROCESSES funneling through one
  * service fold into shared composite log versions (reference:
  * java/statestore-committer-core/src/main/java/sleeper/statestore/committer/StateStoreCommitter.java
  * — the reference routes all commits through a dedicated committer for
  * exactly this amortization), so cross-process commit cost drops from
  * one CAS round-trip EACH to one per shared batch.
  */
final class HttpCommitterClient(commitUrl: String) {
  private val base = commitUrl.stripSuffix("/")
  private val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  /** Submit one transaction against the table whose state store lives at
    * `tableMetaDir` (a path the SERVICE can reach — shared fs/object
    * store). Returns the transaction's individual outcome, exactly as a
    * local [[CommitterQueue.submit]] would.
    *
    * AMBIGUOUS-OUTCOME safety: a connect failure, lost response, or
    * request timeout leaves the client unsure whether the service
    * landed the transaction — retrying a non-idempotent txn (AddFiles
    * from ingest/compaction) blindly could commit the same files twice.
    * Every logical commit therefore carries ONE client-generated
    * transaction id; transport-level retries replay the SAME id, and
    * the service answers a replay with the original attempt's recorded
    * outcome instead of re-executing it (the per-request analog of the
    * addFilesIfAbsent watermark contract).
    */
  def commit(tableMetaDir: String, txn: StateTransaction): CommitOutcome = {
    val txnId = java.util.UUID.randomUUID().toString
    val uri = URI.create(
      s"$base?dir=${URLEncoder.encode(tableMetaDir, UTF_8)}&txn=$txnId")
    val body = JsonStateStore.txnToJsonString(txn)
    val maxAttempts = 4
    var attempt = 1
    while (true) {
      try return commitOnce(uri, body)
      catch {
        case _: java.io.IOException if attempt < maxAttempts =>
          // ambiguous — the service may have landed it; replay the SAME
          // txn id so the dedupe answers instead of double-committing
          Thread.sleep(200L * attempt)
          attempt += 1
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw new java.io.IOException("interrupted during commit POST", e)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def commitOnce(uri: URI, body: String): CommitOutcome = {
    val r = client.send(HttpRequest.newBuilder(uri)
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
      // the submit blocks server-side until its batch lands
      .timeout(java.time.Duration.ofMinutes(2)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body()) match {
      case (200, "committed") => CommitOutcome.Committed
      case (200, "duplicate") => CommitOutcome.Duplicate
      case (409, msg) =>
        val m = msg.stripPrefix("failed:")
        if (m.startsWith(classOf[ConcurrentStateException].getName))
          CommitOutcome.Failed(new ConcurrentStateException(m, null))
        else CommitOutcome.Failed(new IllegalArgumentException(m))
      case (c, msg) => throw new java.io.IOException(s"commit POST → HTTP $c: $msg")
    }
  }
}

/** Single-node claim service — the in-repo stand-in for the managed
  * conditional-put store (DynamoDB in the reference's deployment).
  * Claims are DURABLE: each is a file in `dataDir` published via
  * hard-link (content written to a uuid tmp, then `link(2)` onto the
  * claim name — creation is atomic WITH content, EEXIST is the 409), so
  * a server restart over the same directory loses nothing and two
  * racing PUTs for one name serialize on the filesystem primitive, not
  * on server-side locking. A deployment would put TLS/auth in front and
  * replicate the directory (or swap in the real managed service); the
  * CLIENT protocol — [[HttpClaimStore]] — is the production shape.
  */
final class HttpCasServer(dataDir: String, port: Int = 0) extends AutoCloseable {
  private val root = Paths.get(dataDir)
  Files.createDirectories(root)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val pool = java.util.concurrent.Executors.newCachedThreadPool()

  server.createContext("/claims", (ex: HttpExchange) => handle(ex))
  server.createContext("/commit", (ex: HttpExchange) => handleCommit(ex))
  server.setExecutor(pool) // concurrent writers must not serialize on one thread
  server.start()

  val address: String = s"http://127.0.0.1:${server.getAddress.getPort}/claims"

  /** The committer-as-a-service endpoint (POST one txn per request,
    * `?dir=` = the table's meta dir) — see [[HttpCommitterClient]].
    */
  val commitAddress: String = s"http://127.0.0.1:${server.getAddress.getPort}/commit"

  // one batched committer per table: concurrent client POSTs (the pool
  // runs handlers concurrently) block in submit and fold into shared
  // composite log versions — cross-process commits pay one CAS
  // round-trip per BATCH, not per commit
  private val committers =
    new java.util.concurrent.ConcurrentHashMap[String, CommitterQueue]()

  private def committerFor(metaDir: String): CommitterQueue =
    committers.computeIfAbsent(metaDir,
      // commitUrl = Some(""): the service's own stores commit LOCALLY —
      // a process-wide graft.commit.url must not make the service POST
      // to itself
      d => new CommitterQueue(JsonStateStore.load(d, commitUrl = Some("")),
        maxBatch = 64))

  // Replay dedupe for the /commit endpoint: txn id → the first
  // attempt's response, so a client retrying after an ambiguous failure
  // (lost response, timeout) gets the RECORDED outcome instead of
  // re-executing a non-idempotent transaction. A replay arriving while
  // the first attempt is still in flight blocks on its future. Bounded
  // access-order LRU — an entry only matters for the client's short
  // retry window. Outcomes are ALSO persisted (one small hard-linked
  // file per committed txn, written BEFORE the response goes out), so a
  // server restart — or LRU eviction — inside a client's retry window
  // replays the recorded outcome from disk instead of re-executing.
  // Remaining window: a crash BETWEEN the commit landing and the
  // outcome file appearing makes the retry re-execute; for AddFiles the
  // duplicate-filename precondition then answers 409, which a client
  // retrying an ambiguous failure should treat as possibly-committed
  // and reconcile via the table version.
  private val txnOutcomes = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, java.util.concurrent.CompletableFuture[(Int, String)]](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.util.concurrent.CompletableFuture[(Int, String)]])
          : Boolean = size() > 8192
    })

  private def handleCommit(ex: HttpExchange): Unit = {
    try {
      if (ex.getRequestMethod != "POST") { respond(ex, 405, "method not allowed"); return }
      val params = Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      val dir = params.collectFirst {
          case p if p.startsWith("dir=") => URLDecoder.decode(p.drop(4), UTF_8)
        }.getOrElse { respond(ex, 400, "missing dir parameter"); return }
      val txnId = params.collectFirst { case p if p.startsWith("txn=") => p.drop(4) }
      val pending = txnId.map { id =>
        val fresh = new java.util.concurrent.CompletableFuture[(Int, String)]()
        val prior = txnOutcomes.putIfAbsent(id, fresh)
        if (prior != null) {
          // replay: answer with the original attempt's outcome
          val (code, msg) = prior.join()
          respond(ex, code, msg)
          return
        }
        // restart / eviction replay: the outcome may be on disk from a
        // previous server life; complete the fresh future with it so
        // concurrent replays blocked on it get the same answer
        recordedOutcome(id) match {
          case Some((code, msg)) =>
            fresh.complete((code, msg))
            respond(ex, code, msg)
            return
          case None => ()
        }
        fresh
      }
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      try {
        val txn = JsonStateStore.txnFromJson(body)
        val (code, msg) = committerFor(dir).submit(txn) match {
          case CommitOutcome.Committed => (200, "committed")
          case CommitOutcome.Duplicate => (200, "duplicate")
          case CommitOutcome.Failed(e) =>
            (409, s"failed:${e.getClass.getName}: ${String.valueOf(e.getMessage)}")
        }
        // durable BEFORE the response: a client that saw an answer can
        // always replay it across a server restart
        txnId.foreach(persistOutcome(_, code, msg))
        pending.foreach(_.complete((code, msg)))
        respond(ex, code, msg)
      } catch {
        case scala.util.control.NonFatal(e) =>
          // the txn did NOT reach submit (parse failure) or submit threw
          // before producing an outcome — nothing landed; drop the entry
          // so a retry re-executes instead of replaying a dead future
          pending.foreach { f =>
            txnId.foreach(txnOutcomes.remove(_, f))
            f.complete((500, String.valueOf(e.getMessage)))
          }
          throw e
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try respond(ex, 500, String.valueOf(e.getMessage))
        catch { case scala.util.control.NonFatal(_) => () }
    } finally ex.close()
  }

  // durable txn-outcome sidecars (same hard-link publication as claims)
  private val txnDir = root.resolve(".txns")
  Files.createDirectories(txnDir)

  private def txnFile(id: String): java.nio.file.Path = {
    require(!id.contains("/") && !id.startsWith("."), s"bad txn id $id")
    txnDir.resolve(id)
  }

  private def persistOutcome(id: String, code: Int, msg: String): Unit = {
    val tmp = txnDir.resolve(s".txn-${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, s"$code\n$msg".getBytes(UTF_8))
    try Files.createLink(txnFile(id), tmp)
    catch { case _: FileAlreadyExistsException => () } // first write wins
    Files.deleteIfExists(tmp)
  }

  private def recordedOutcome(id: String): Option[(Int, String)] = {
    val f = txnFile(id)
    if (!Files.exists(f)) None
    else {
      val s = new String(Files.readAllBytes(f), UTF_8)
      val i = s.indexOf('\n')
      if (i < 0) None else Some((s.take(i).toInt, s.drop(i + 1)))
    }
  }

  private def fileFor(encName: String) = {
    // claim names arrive URL-encoded; keep them encoded on disk so the
    // filename stays scheme-safe regardless of what the name contains
    require(!encName.contains("/") && !encName.startsWith("."), s"bad claim name $encName")
    root.resolve(encName)
  }

  private def handle(ex: HttpExchange): Unit = {
    try {
      val rel = ex.getRequestURI.getRawPath.stripPrefix("/claims").stripPrefix("/")
      (ex.getRequestMethod, rel) match {
        case ("GET", "") =>
          val sb = new StringBuilder
          val listing = Files.list(root)
          try listing.forEach { p =>
            val n = p.getFileName.toString
            if (!n.startsWith(".")) {
              val uuid = new String(Files.readAllBytes(p), UTF_8)
              sb.append(URLDecoder.decode(n, UTF_8)).append('\t').append(uuid).append('\n')
            }
          } finally listing.close()
          respond(ex, 200, sb.toString)
        case ("PUT", name) if name.nonEmpty =>
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val tmp = root.resolve(s".put-${java.util.UUID.randomUUID()}.tmp")
          Files.write(tmp, body.getBytes(UTF_8))
          val created =
            try { Files.createLink(fileFor(name), tmp); true }
            catch { case _: FileAlreadyExistsException => false }
          Files.deleteIfExists(tmp)
          respond(ex, if (created) 201 else 409, if (created) "created" else "exists")
        case ("GET", name) =>
          val f = fileFor(name)
          if (Files.exists(f)) respond(ex, 200, new String(Files.readAllBytes(f), UTF_8))
          else respond(ex, 404, "")
        case ("DELETE", name) if name.nonEmpty =>
          Files.deleteIfExists(fileFor(name))
          respond(ex, 204, "")
        case _ => respond(ex, 405, "method not allowed")
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try respond(ex, 500, String.valueOf(e.getMessage))
        catch { case scala.util.control.NonFatal(_) => () }
    } finally ex.close()
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    if (code == 204) ex.sendResponseHeaders(code, -1)
    else { ex.sendResponseHeaders(code, if (bytes.length == 0) -1 else bytes.length) }
    if (bytes.length > 0 && code != 204) ex.getResponseBody.write(bytes)
  }

  override def close(): Unit = {
    server.stop(0)
    committers.forEach((_, q) =>
      try q.close() catch { case scala.util.control.NonFatal(_) => () })
    pool.shutdownNow()
  }
}
