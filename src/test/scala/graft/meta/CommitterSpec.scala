package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Batched state-store committer: Batch transaction fold semantics,
  * per-request validation outcomes, durable replay of composite
  * versions, multi-writer throughput shape (versions written <<
  * commits), and zero lost updates under cross-store contention.
  */
class CommitterSpec extends AnyFunSuite {

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("key", StringType)),
    sortKeys = Nil,
    values = Seq(GraftField("value", LongType)))

  private def newStore() =
    new InMemoryStateStore(schema, PartitionTree.fromSplitPoints(schema, Seq("m")))

  private def leaves(s: StateStore) = s.partitionTree.leaves.map(_.id).sorted

  test("Batch folds children in order and stamps distinct generations") {
    val s = newStore()
    val Seq(l, _) = leaves(s)
    val out = s.commitValidated(Seq(
      StateTransaction.AddFiles(Vector(FileReference("a", l, 1))),
      StateTransaction.AddFiles(Vector(FileReference("b", l, 1))),
      StateTransaction.AddTombstones(Vector(FileReference("t", l, 1)))))
    assert(out == Seq(CommitOutcome.Committed, CommitOutcome.Committed,
      CommitOutcome.Committed))
    val bySeq = s.fileReferences.sortBy(_.seq).map(r => r.filename -> r.seq)
    assert(bySeq == Seq("a" -> 1L, "b" -> 2L)) // fold order = generation order
    assert(s.tombstones.map(_.seq) == Seq(3L)) // draws nextSeq from evolving state
  }

  test("a failing child is excluded with ITS error; siblings commit; duplicates report") {
    val s = newStore()
    val Seq(l, _) = leaves(s)
    s.addFilesIfAbsent("app", 7L, Seq(FileReference("seed", l, 1)))
    val out = s.commitValidated(Seq(
      StateTransaction.AddFiles(Vector(FileReference("ok1", l, 1))),
      // fails: duplicate filename against the EVOLVING state (its sibling)
      StateTransaction.AddFiles(Vector(FileReference("ok1", l, 1))),
      // fails: unknown partition (a precondition error, reported individually)
      StateTransaction.AddFiles(Vector(FileReference("x", "nope", 1))),
      // duplicate idempotent-txn watermark — the replayed-batch outcome
      StateTransaction.AddFiles(Vector(FileReference("late", l, 1)), Some("app" -> 7L)),
      StateTransaction.AddFiles(Vector(FileReference("ok2", l, 1)), Some("app" -> 8L))))
    assert(out(0) == CommitOutcome.Committed)
    assert(out(1).isInstanceOf[CommitOutcome.Failed] &&
      out(1).asInstanceOf[CommitOutcome.Failed].error.isInstanceOf[IllegalArgumentException])
    assert(out(2).isInstanceOf[CommitOutcome.Failed])
    assert(out(3) == CommitOutcome.Duplicate)
    assert(out(4) == CommitOutcome.Committed)
    assert(s.fileReferences.map(_.filename).toSet == Set("seed", "ok1", "ok2"))
    assert(s.lastTxnVersion("app").contains(8L))
  }

  test("a batched version persists as ONE log entry and replays identically") {
    val dir = Files.createTempDirectory("graft-batch").toString
    val s = JsonStateStore.create(dir, schema,
      PartitionTree.fromSplitPoints(schema, Seq("m")))
    val Seq(l, r) = leaves(s)
    val v0 = s.currentVersion
    val out = s.commitValidated(Seq(
      StateTransaction.AddFiles(Vector(FileReference("a", l, 10))),
      StateTransaction.AddFiles(Vector(FileReference("b", r, 20)), Some("st" -> 3L)),
      StateTransaction.AddTombstones(Vector(FileReference("t", l, 1)))))
    assert(out.forall(_ == CommitOutcome.Committed))
    assert(s.currentVersion == v0 + 1) // three commits, one version
    // a fresh store replays the composite from the log
    val s2 = JsonStateStore.load(dir)
    assert(s2.fileReferences.map(r2 => (r2.filename, r2.seq)).sorted ==
      Seq(("a", 1L), ("b", 2L)))
    assert(s2.tombstones.map(_.filename) == Seq("t"))
    assert(s2.lastTxnVersion("st").contains(3L))
  }

  test("CommitterQueue: concurrent submitters all land; versions written << commits") {
    val dir = Files.createTempDirectory("graft-cq").toString
    val s = JsonStateStore.create(dir, schema,
      PartitionTree.fromSplitPoints(schema, Seq("m")))
    val Seq(l, _) = leaves(s)
    val v0 = s.currentVersion
    val q = new CommitterQueue(s, maxBatch = 64)
    val threads = 8
    val perThread = 25
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futures = (0 until threads).map { t =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = (0 until perThread).forall { i =>
            q.commit(StateTransaction.AddFiles(
              Vector(FileReference(s"w$t-f$i", l, 1)))) == CommitOutcome.Committed
          }
        })
      }
      assert(futures.forall(_.get()))
    } finally { pool.shutdown(); q.close() }
    assert(s.fileReferences.size == threads * perThread)
    val versions = s.currentVersion - v0
    assert(versions < threads * perThread / 2,
      s"expected batching to fold commits: $versions versions for ${threads * perThread} commits")
    // distinct generations per commit survive the batching
    assert(s.fileReferences.map(_.seq).distinct.size == threads * perThread)
  }

  test("batched committer vs a serial rival store: zero lost updates") {
    val dir = Files.createTempDirectory("graft-cq-rival").toString
    val s1 = JsonStateStore.create(dir, schema,
      PartitionTree.fromSplitPoints(schema, Seq("m")))
    val s2 = JsonStateStore.load(dir) // separate store instance, same log
    val Seq(l, _) = leaves(s1)
    val q = new CommitterQueue(s1, maxBatch = 32)
    val rival = new Thread(() => (0 until 30).foreach { i =>
      var done = false
      while (!done) {
        try { s2.addFiles(Seq(FileReference(s"rival-$i", l, 1))); done = true }
        catch { case _: ConcurrentStateException => () }
      }
    })
    rival.start()
    try {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val futures = (0 until 4).map { t =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = (0 until 15).forall { i =>
              q.commit(StateTransaction.AddFiles(
                Vector(FileReference(s"q$t-f$i", l, 1)))) == CommitOutcome.Committed
            }
          })
        }
        assert(futures.forall(_.get()))
      } finally pool.shutdown()
    } finally { rival.join(); q.close() }
    s1.reloadLatest()
    val names = s1.fileReferences.map(_.filename).toSet
    assert((0 until 30).forall(i => names(s"rival-$i")))
    assert((0 until 4).forall(t => (0 until 15).forall(i => names(s"q$t-f$i"))))
    assert(names.size == 30 + 60)
  }

  test("submit racing close never hangs; a dead drain thread fails submitters") {
    // (a) submits racing close(): every submitter gets AN answer — either
    // its outcome or a committer-closed failure — within the timeout
    val s = newStore()
    val Seq(l, _) = leaves(s)
    val q = new CommitterQueue(s, maxBatch = 4)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    try {
      val futures = (0 until 64).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            val r = try {
              q.submit(StateTransaction.AddFiles(
                Vector(FileReference(s"race-$i", l, 1)))) match {
                case CommitOutcome.Committed => "committed"
                case CommitOutcome.Failed(_) => "failed"
                case CommitOutcome.Duplicate => "duplicate"
              }
            } catch { case _: IllegalStateException => "closed" }
            results.add(r)
          }
        })
      }
      Thread.sleep(5) // let some submits land before the close
      q.close()
      futures.foreach(f => f.get(10, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(results.size == 64, "every submitter answered — none hung")
    // committed requests really are in the store
    val names = s.fileReferences.map(_.filename).toSet
    import scala.jdk.CollectionConverters._
    val committedCount = results.asScala.count(_ == "committed")
    assert(names.count(_.startsWith("race-")) == committedCount)

    // (b) a drain thread killed by a fatal error answers everyone and
    // marks the committer closed instead of hanging future submitters
    val dying = new InMemoryStateStore(schema,
      PartitionTree.fromSplitPoints(schema, Seq("m"))) {
      override private[graft] def commitValidated(
          txns: Seq[StateTransaction]): Seq[CommitOutcome] =
        throw new InterruptedException("fatal: NonFatal misses this")
    }
    val q2 = new CommitterQueue(dying, maxBatch = 4)
    val out = q2.submit(StateTransaction.AddFiles(Vector(FileReference("x", l, 1))))
    assert(out.isInstanceOf[CommitOutcome.Failed], s"got $out")
    // the committer is now closed — a late submit fails fast, never hangs
    intercept[IllegalStateException] {
      q2.submit(StateTransaction.AddFiles(Vector(FileReference("y", l, 1))))
    }
  }

  test("nested batches and empty batches are rejected") {
    intercept[IllegalArgumentException](StateTransaction.Batch(Vector.empty))
    intercept[IllegalArgumentException](StateTransaction.Batch(Vector(
      StateTransaction.Batch(Vector(StateTransaction.SplitFileRefs)))))
  }
}
