package graft.meta

/** Child-process body for the cross-process CAS stress spec: loads the
  * state store at `dir` and lands `commits` uniquely-named file
  * references, retrying through contention until every one is committed.
  * Spawned as a separate JVM (`java -cp <test classpath> graft.meta.CasHammer`)
  * so the hard-link CAS is exercised across PROCESS boundaries — separate
  * page caches, separate JVM monitors, nothing shared but the directory —
  * the way rival ingest/compaction jobs on different hosts would hit an
  * object-store CAS (the reference's DynamoDB log is inherently
  * multi-writer; this proves the filesystem CAS gives the same guarantee).
  *
  * Modes:
  *  - serial (default): one thread, one CAS round-trip per commit;
  *  - `--batch=<threads>`: the batched-committer shape — T in-process
  *    submitters funneling through one [[CommitterQueue]], so each CAS
  *    round-trip carries a whole batch. Cross-JVM contention still
  *    arbitrates through the CAS; batching is what keeps the lost-CAS
  *    retry storms amortized.
  *  - `--remote=<commitUrl>`: the committer-as-a-SERVICE shape — every
  *    commit POSTs to the shared [[HttpCasServer]] `/commit` endpoint,
  *    so commits from DIFFERENT processes fold into shared composite
  *    log versions (in-process batching only amortizes within one JVM).
  *
  * Prints "DONE <n> ELAPSED <ms>" on success; any lost update surfaces
  * as a missing reference in the parent's final assertion.
  */
object CasHammer {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val writerId = args(1)
    val commits = args(2).toInt
    val batchThreads = args.collectFirst {
      case a if a.startsWith("--batch=") => a.drop(8).toInt
    }
    val remote = args.collectFirst {
      case a if a.startsWith("--remote=") => a.drop(9)
    }
    remote.foreach { url =>
      // remote mode: no local store at all — the service owns the log.
      // A few submitter threads per process give its batches something
      // to fold; the cross-PROCESS folding happens server-side.
      val clientThreads = batchThreads.getOrElse(4)
      val client = new HttpCommitterClient(url)
      val leaf = JsonStateStore.load(dir).partitionTree.leaves.map(_.id).min
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(clientThreads)
      try {
        val futures = (0 until commits).map { i =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = {
              var done = false
              while (!done) {
                client.commit(dir, StateTransaction.AddFiles(
                    Vector(FileReference(s"$writerId-f$i", leaf, 1)))) match {
                  case CommitOutcome.Committed => done = true
                  case CommitOutcome.Failed(_: ConcurrentStateException) => ()
                  case CommitOutcome.Failed(e) => throw e
                  case CommitOutcome.Duplicate => done = true
                }
              }
            }
          })
        }
        futures.foreach(_.get())
      } finally pool.shutdown()
      println(s"DONE $commits ELAPSED ${(System.nanoTime() - t0) / 1000000}")
      return
    }
    // optional positional 4th arg: an HTTP claim-service URL — arbitrate
    // through the remote conditional-put store instead of the filesystem
    val cas = args.drop(3).filterNot(_.startsWith("--")).headOption
      .map(url => new HttpCas(url))
    val store = JsonStateStore.load(dir, cas = cas)
    val leaf = store.partitionTree.leaves.map(_.id).min
    val t0 = System.nanoTime()
    batchThreads match {
      case None =>
        var landed = 0
        while (landed < commits) {
          try {
            store.addFiles(Seq(FileReference(s"$writerId-f$landed", leaf, 1)))
            landed += 1
          } catch {
            case _: ConcurrentStateException => () // exhausted one retry budget; go again
          }
        }
      case Some(threads) =>
        val q = new CommitterQueue(store, maxBatch = 64)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        try {
          val futures = (0 until commits).map { i =>
            pool.submit(new java.util.concurrent.Callable[Unit] {
              def call(): Unit = {
                var done = false
                while (!done) {
                  q.submit(StateTransaction.AddFiles(
                      Vector(FileReference(s"$writerId-f$i", leaf, 1)))) match {
                    case CommitOutcome.Committed => done = true
                    case CommitOutcome.Failed(_: ConcurrentStateException) => ()
                    case CommitOutcome.Failed(e) => throw e
                    case CommitOutcome.Duplicate => done = true // not reachable here
                  }
                }
              }
            })
          }
          futures.foreach(_.get())
        } finally { pool.shutdown(); q.close() }
    }
    val ms = (System.nanoTime() - t0) / 1000000
    println(s"DONE $commits ELAPSED $ms")
  }
}
