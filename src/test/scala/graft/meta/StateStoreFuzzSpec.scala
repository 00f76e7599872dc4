package graft.meta

import java.nio.file.Files
import scala.util.Random
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Deterministic fuzz over random operation sequences: whatever order
  * ingest commits, compactions, metadata splits, ref pushes, and GC
  * removals interleave in, the store must uphold its invariants and the
  * JSON round-trip must reproduce the exact state. Seeded, so a failure
  * reproduces.
  */
class StateStoreFuzzSpec extends AnyFunSuite {

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("key", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  private def invariants(s: StateStore, label: String): Unit = {
    val tree = s.partitionTree
    val refs = s.fileReferences
    val gc = s.unreferencedFiles
    // every ref points at an existing partition
    refs.foreach(r => assert(tree.partitions.exists(_.id == r.partitionId),
      s"$label: ref ${r.filename} on unknown partition ${r.partitionId}"))
    // a file queued for GC is referenced nowhere
    val referenced = refs.map(_.filename).toSet
    gc.foreach(e => assert(!referenced(e.filename),
      s"$label: ${e.filename} queued for GC while still referenced"))
    // no duplicate (filename, partition) references
    assert(refs.map(r => (r.filename, r.partitionId)).distinct.size == refs.size,
      s"$label: duplicate references")
    // tombstones: known partitions, no (filename, partition) dups, and
    // every store-stamped delete marker carries its write generation
    val tombs = s.tombstones
    tombs.foreach(t => assert(tree.partitions.exists(_.id == t.partitionId),
      s"$label: tombstone ${t.filename} on unknown partition ${t.partitionId}"))
    assert(tombs.map(t => (t.filename, t.partitionId)).distinct.size == tombs.size,
      s"$label: duplicate tombstones")
    tombs.foreach(t => assert(t.seq >= 1L, s"$label: unstamped tombstone ${t.filename}"))
  }

  test("random op sequences uphold invariants and survive the JSON round-trip") {
    for (seed <- 0 until 20) {
      val rnd = new Random(seed)
      val dir = Files.createTempDirectory(s"graft-fuzz-$seed").toString
      val store = JsonStateStore.create(dir, schema,
        PartitionTree.fromSplitPoints(schema, Seq(1000L)))
      var fileCounter = 0
      var splitCounter = 0
      var appVersion = 0L

      for (op <- 0 until 60) {
        val label = s"seed=$seed op=$op"
        val leaves = store.partitionTree.leaves.map(_.id)
        rnd.nextInt(8) match {
          case 0 | 1 => // ingest-style addFiles to random leaves
            val n = 1 + rnd.nextInt(3)
            val refs = (0 until n).map { _ =>
              fileCounter += 1
              FileReference(s"f$fileCounter", leaves(rnd.nextInt(leaves.size)),
                10 + rnd.nextInt(100))
            }
            store.addFiles(refs)
          case 2 => // compaction of a random partition's unassigned files
            val byPid = store.fileReferences.filter(_.jobId.isEmpty).groupBy(_.partitionId)
            if (byPid.nonEmpty) {
              val (pid, refs) = byPid.toSeq.sortBy(_._1).apply(rnd.nextInt(byPid.size))
              if (refs.size >= 2) {
                fileCounter += 1
                store.replaceFiles(pid, refs.map(_.filename),
                  FileReference(s"f$fileCounter", pid, refs.map(_.rowCount).sum))
              }
            }
          case 3 => // metadata split of a random leaf + push refs down
            val leaf = leaves(rnd.nextInt(leaves.size))
            splitCounter += 1
            val p = store.partitionTree(leaf)
            val r = p.region.ranges.head.canonical
            // a split point strictly inside the leaf's range (if any)
            val lo = r.min.map(_.asInstanceOf[Long]).getOrElse(-1000L)
            val hi = r.max.map(_.asInstanceOf[Long]).getOrElse(5000L)
            if (hi - lo > 1) {
              store.splitPartition(leaf, 0, lo + 1 + rnd.nextInt((hi - lo - 1).toInt min 100),
                s"$leaf-a$splitCounter", s"$leaf-b$splitCounter")
              store.splitFileReferences()
            }
          case 4 => // GC removal of some queued files
            val gc = store.unreferencedFiles
            if (gc.nonEmpty) store.removeGCFiles(gc.take(1 + rnd.nextInt(gc.size)).map(_.filename))
          case 5 => // idempotent streaming-style commit; replays must no-op
            fileCounter += 1
            appVersion += 1
            val ref = FileReference(s"f$fileCounter", leaves(rnd.nextInt(leaves.size)), 5)
            assert(store.addFilesIfAbsent("fuzz-app", appVersion, Seq(ref)), label)
            assert(!store.addFilesIfAbsent("fuzz-app", appVersion,
              Seq(ref.copy(filename = s"f$fileCounter-dup"))), label)
          case 6 => // row-key delete markers on a random leaf
            fileCounter += 1
            store.addTombstones(Seq(FileReference(
              s"t$fileCounter", leaves(rnd.nextInt(leaves.size)), 1 + rnd.nextInt(5))))
          case 7 => // atomic MERGE commit (puts + markers), half watermarked
            fileCounter += 2
            val put = FileReference(s"f${fileCounter - 1}",
              leaves(rnd.nextInt(leaves.size)), 5)
            val tomb = FileReference(s"t$fileCounter",
              leaves(rnd.nextInt(leaves.size)), 1)
            if (rnd.nextBoolean()) store.commitMerge(Seq(put), Seq(tomb))
            else {
              appVersion += 1
              assert(store.commitMergeIfAbsent("fuzz-app", appVersion,
                Seq(put), Seq(tomb)), label)
              assert(!store.commitMergeIfAbsent("fuzz-app", appVersion,
                Seq(put.copy(filename = s"f$fileCounter-dup")), Nil), label)
            }
            // the merge's marker stamps one generation below its puts
            val pSeq = store.fileReferences.find(_.filename == put.filename).get.seq
            val tSeq = store.tombstones.find(_.filename == tomb.filename).get.seq
            assert(tSeq + 1 == pSeq, s"$label: merge generations $tSeq/$pSeq")
        }
        invariants(store, label)
      }

      // split refs fully down, then the durable state must reload exactly
      while (store.splitFileReferences() > 0) {}
      invariants(store, s"seed=$seed final")
      val reloaded = JsonStateStore.load(dir)
      assert(reloaded.fileReferences.toSet == store.fileReferences.toSet, s"seed=$seed refs")
      assert(reloaded.unreferencedFiles.toSet == store.unreferencedFiles.toSet, s"seed=$seed gc")
      assert(reloaded.partitionTree.partitions.toSet == store.partitionTree.partitions.toSet,
        s"seed=$seed tree")
      assert(reloaded.lastTxnVersion("fuzz-app") == store.lastTxnVersion("fuzz-app"),
        s"seed=$seed txns")
      assert(reloaded.tombstones.toSet == store.tombstones.toSet, s"seed=$seed tombstones")
    }
  }
}
