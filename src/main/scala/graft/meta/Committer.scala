package graft.meta

import java.util.concurrent.{CompletableFuture, LinkedBlockingQueue, TimeUnit}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Per-transaction result of a batched commit. `Duplicate` is the
  * idempotent-txn outcome (the watermark was already recorded — a
  * replayed streaming batch or resubmitted job); `Failed` carries the
  * transaction's OWN precondition error, unchanged from what a serial
  * commit would have thrown.
  */
sealed trait CommitOutcome
object CommitOutcome {
  case object Committed extends CommitOutcome
  case object Duplicate extends CommitOutcome
  final case class Failed(error: Throwable) extends CommitOutcome
}

/** Batched state-store committer — the amortization seam for high
  * commit rates (reference:
  * java/statestore-committer-core/src/main/java/sleeper/statestore/committer/StateStoreCommitter.java:
  * the reference funnels thousands of commits/s through one committer
  * that applies a queue of commit requests per round-trip to the
  * durable log; here the same shape sits directly on the CAS seam).
  *
  * Concurrent writers (compaction jobs, parallel ingests, GC) submit
  * prepared [[StateTransaction]]s; a single drain thread folds up to
  * `maxBatch` queued transactions into ONE [[StateTransaction.Batch]]
  * log version ([[InMemoryStateStore.commitValidated]]), so the cost of
  * a CAS round-trip — and, under cross-process contention, the lost-CAS
  * retry storms — is shared by the whole batch instead of paid per
  * commit. Each submission still gets its INDIVIDUAL outcome: a
  * transaction whose preconditions fail against the evolving state is
  * excluded from the batch and reports exactly the error a serial
  * commit would have thrown; siblings are unaffected.
  *
  * At 100 TB this is the difference between commit throughput capped at
  * (1 / CAS-round-trip) commits/s and (maxBatch / CAS-round-trip): with
  * ~10ms object-store conditional puts, serial tops out near 100
  * commits/s while a 64-batch sustains thousands — without weakening
  * any guarantee, because validation happens inside the same
  * monitor+retry discipline as serial commits.
  */
final class CommitterQueue(store: InMemoryStateStore, maxBatch: Int = 64)
    extends AutoCloseable {
  require(maxBatch >= 1, "maxBatch must be positive")

  private final class Req(val txn: StateTransaction) {
    val done = new CompletableFuture[CommitOutcome]()
  }

  private val queue = new LinkedBlockingQueue[Req]()
  @volatile private var open = true
  @volatile private var batches = 0L
  @volatile private var committed = 0L

  private val drain = new Thread(() => loop(), "graft-committer")
  drain.setDaemon(true)
  drain.start()

  /** Submit one prepared transaction; blocks until the batch carrying
    * it is durably committed (or it is individually rejected).
    */
  def submit(txn: StateTransaction): CommitOutcome = {
    if (!open) throw new IllegalStateException("committer is closed")
    val r = new Req(txn)
    queue.put(r)
    // close() (or a dying drain thread) may have flipped `open` between
    // the check and the put, after the closing sweep already ran — a
    // request stranded that way would block its submitter forever. If we
    // can still pull it back out, nobody owns it: answer it ourselves.
    // If remove fails, the drain or the closing sweep has it (complete
    // is idempotent, so a double answer is harmless).
    if (!open && queue.remove(r))
      r.done.complete(CommitOutcome.Failed(
        new IllegalStateException("committer is closed")))
    r.done.join()
  }

  /** submit, rethrowing an individual failure with its original type
    * (Duplicate passes through — it is the idempotent no-op outcome).
    */
  def commit(txn: StateTransaction): CommitOutcome = submit(txn) match {
    case CommitOutcome.Failed(e) => throw e
    case ok => ok
  }

  /** (log versions written, transactions committed) — the batching
    * ratio observed so far; committed/batchesWritten is the average
    * amortization factor.
    */
  def stats: (Long, Long) = (batches, committed)

  private def loop(): Unit = {
    val buf = new java.util.ArrayList[Req](maxBatch)
    try {
      while (open || !queue.isEmpty) {
        buf.clear()
        val first = queue.poll(25, TimeUnit.MILLISECONDS)
        if (first != null) {
          buf.add(first)
          if (maxBatch > 1) queue.drainTo(buf, maxBatch - 1)
          val reqs = buf.asScala.toVector
          val outcomes: Seq[CommitOutcome] =
            try store.commitValidated(reqs.map(_.txn))
            catch {
              // retry budget exhausted / store closed: the whole batch
              // failed as a unit — report it to every waiter
              case NonFatal(e) => Vector.fill(reqs.size)(CommitOutcome.Failed(e))
            }
          batches += 1
          committed += outcomes.count(_ == CommitOutcome.Committed)
          reqs.lazyZip(outcomes).foreach((r, o) => r.done.complete(o))
        }
      }
    } catch {
      // a throw commitValidated's NonFatal guard misses (fatal error,
      // interrupt) kills this thread — without this, every current and
      // future submitter would block forever on a committer that still
      // reads as open. Mark closed, answer everything in flight, rethrow.
      case t: Throwable =>
        open = false
        val err = new IllegalStateException("committer drain thread died", t)
        buf.asScala.foreach(_.done.complete(CommitOutcome.Failed(err)))
        queue.asScala.foreach(_.done.complete(CommitOutcome.Failed(err)))
        throw t
    }
  }

  /** Stop accepting work, drain what's queued, and join the thread. */
  override def close(): Unit = {
    open = false
    drain.join()
    // anything enqueued in the closing race still gets an answer
    queue.asScala.foreach(_.done.complete(
      CommitOutcome.Failed(new IllegalStateException("committer closed"))))
  }
}
