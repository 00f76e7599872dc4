package graft.meta

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class StateStoreSpec extends AnyFunSuite {

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("key", StringType)),
    sortKeys = Nil,
    values = Seq(GraftField("value", LongType)))

  private def newStore() =
    new InMemoryStateStore(schema, PartitionTree.fromSplitPoints(schema, Seq("m")))

  private def leafIds(s: StateStore) = s.partitionTree.leaves.map(_.id).sorted

  test("addFiles + duplicate rejection") {
    val s = newStore()
    val Seq(l, r) = leafIds(s)
    s.addFiles(Seq(FileReference("f1", l, 100), FileReference("f2", r, 50)))
    assert(s.fileReferences.size == 2)
    intercept[IllegalArgumentException](s.addFiles(Seq(FileReference("f1", l, 100))))
    intercept[IllegalArgumentException](s.addFiles(Seq(FileReference("f3", "nope", 1))))
  }

  test("replaceFiles commits compaction atomically and queues orphans for GC") {
    val s = newStore()
    val Seq(l, _) = leafIds(s)
    s.addFiles(Seq(FileReference("f1", l, 100), FileReference("f2", l, 50)))
    s.replaceFiles(l, Seq("f1", "f2"), FileReference("out", l, 140), nowMs = 1000L)
    assert(s.fileReferences.map(_.filename) == Seq("out"))
    assert(s.unreferencedFiles.toSet ==
      Set(GCEntry("f1", 1000L, Some(l)), GCEntry("f2", 1000L, Some(l))))
    intercept[IllegalArgumentException](
      s.replaceFiles(l, Seq("missing"), FileReference("x", l, 1)))
  }

  test("file referenced by two partitions is GC'd only when both release it") {
    val s = newStore()
    val Seq(l, r) = leafIds(s)
    s.addFiles(Seq(FileReference("shared", l, 100), FileReference("shared", r, 100),
      FileReference("lonely", l, 10)))
    s.replaceFiles(l, Seq("shared", "lonely"), FileReference("outL", l, 90), nowMs = 5L)
    assert(s.unreferencedFiles.map(_.filename) == Seq("lonely")) // still referenced in r
    s.replaceFiles(r, Seq("shared"), FileReference("outR", r, 80), nowMs = 6L)
    assert(s.unreferencedFiles.map(_.filename).toSet == Set("lonely", "shared"))
  }

  test("splitPartition + splitFileReferences push refs to children") {
    val s = newStore()
    val Seq(l, _) = leafIds(s)
    s.addFiles(Seq(FileReference("f1", l, 100)))
    s.splitPartition(l, 0, "g", s"$l-a", s"$l-b")
    assert(!s.partitionTree(l).isLeaf)
    val n = s.splitFileReferences()
    assert(n == 1)
    val refs = s.fileReferences
    assert(refs.size == 2 && refs.forall(_.filename == "f1"))
    assert(refs.map(_.partitionId).toSet == Set(s"$l-a", s"$l-b"))
    assert(refs.forall(_.rowCount == 50))
  }

  test("assignJob guards double assignment") {
    val s = newStore()
    val Seq(l, _) = leafIds(s)
    s.addFiles(Seq(FileReference("f1", l, 100)))
    s.assignJob("j1", l, Seq("f1"))
    intercept[IllegalArgumentException](s.assignJob("j2", l, Seq("f1")))
  }

  test("JsonStateStore round-trips through the version chain") {
    val dir = Files.createTempDirectory("graft-store").toString
    val schema2 = GraftSchema(
      rowKeys = Seq(GraftField("k1", LongType), GraftField("k2", BinaryType)),
      sortKeys = Seq(GraftField("s", IntegerType)),
      values = Seq(GraftField("m", MapType(StringType, LongType), nullable = true)))
    val s = JsonStateStore.create(dir, schema2, PartitionTree.single(schema2))
    s.addFiles(Seq(FileReference("f1", "root", 10)))
    s.splitPartition("root", 0, 42L, "a", "b")
    s.splitFileReferences()
    s.replaceFiles("a", Seq("f1"), FileReference("f2", "a", 5), nowMs = 99L)

    val loaded = JsonStateStore.load(dir)
    assert(loaded.schema == schema2)
    assert(loaded.partitionTree.partitions.toSet == s.partitionTree.partitions.toSet)
    assert(loaded.fileReferences.toSet == s.fileReferences.toSet)
    assert(loaded.unreferencedFiles == s.unreferencedFiles)
    assert(loaded.currentVersion == s.currentVersion)
    // a store loaded at version N persists N+1 next
    loaded.addFiles(Seq(FileReference("f3", "b", 7)))
    assert(loaded.currentVersion == s.currentVersion + 1)
  }

  test("racing writers: the loser auto-retries on refreshed state; no transaction is lost") {
    val dir = Files.createTempDirectory("graft-race").toString
    val a = JsonStateStore.create(dir, schema, PartitionTree.fromSplitPoints(schema, Seq("m")))
    val b = JsonStateStore.load(dir)
    val Seq(l, r) = a.partitionTree.leaves.map(_.id).sorted

    a.addFiles(Seq(FileReference("from-a", l, 10))) // a wins v2
    b.addFiles(Seq(FileReference("from-b", r, 20))) // b loses the CAS on v2, retries onto v3

    assert(b.fileReferences.map(_.filename).toSet == Set("from-a", "from-b"))
    assert(b.currentVersion == 3)
    val reread = JsonStateStore.load(dir)
    assert(reread.fileReferences.map(_.filename).toSet == Set("from-a", "from-b"))
  }

  test("content-conflicting transactions surface as precondition failures, not silent loss") {
    val dir = Files.createTempDirectory("graft-race2").toString
    val a = JsonStateStore.create(dir, schema, PartitionTree.fromSplitPoints(schema, Seq("m")))
    val b = JsonStateStore.load(dir)
    val Seq(l, _) = a.partitionTree.leaves.map(_.id).sorted
    a.addFiles(Seq(FileReference("f1", l, 100), FileReference("f2", l, 50)))
    // b tries to commit the SAME filenames: the lost CAS reloads disk
    // truth and the retried precondition rejects the duplicates.
    intercept[IllegalArgumentException](
      b.addFiles(Seq(FileReference("f1", l, 100), FileReference("f2", l, 50))))
    // b's store is consistent and usable right away.
    b.replaceFiles(l, Seq("f1", "f2"), FileReference("out", l, 140), nowMs = 1L)
    assert(b.fileReferences.map(_.filename) == Seq("out"))
    assert(JsonStateStore.load(dir).fileReferences.map(_.filename) == Seq("out"))
  }

  test("transaction log is pruned to the retention window; time travel inside it works") {
    val dir = Files.createTempDirectory("graft-prune").toString
    val s = JsonStateStore.create(dir, schema, PartitionTree.fromSplitPoints(schema, Seq("m")))
    val Seq(l, _) = s.partitionTree.leaves.map(_.id).sorted
    val n = JsonStateStore.RetainedVersions.toInt + 60 // enough commits to trigger pruning
    (0 until n).foreach(i => s.addFiles(Seq(FileReference(s"f$i", l, 1))))
    var snaps = 0; var txns = 0
    Files.list(java.nio.file.Paths.get(dir)).iterator().forEachRemaining { p =>
      val name = p.getFileName.toString
      if (name.matches("state-v\\d+\\.json")) snaps += 1
      if (name.matches("txn-v\\d+\\.json")) txns += 1
    }
    // snapshots are sparse (one per interval inside the retained window);
    // the txn tail is bounded by retention + one interval
    val bound = JsonStateStore.RetainedVersions + JsonStateStore.SnapshotInterval + 3
    assert(snaps <= bound / JsonStateStore.SnapshotInterval + 2, s"too many snapshots: $snaps")
    assert(txns <= bound, s"txn log not pruned: $txns entries")
    // latest state still loads with everything in it
    val loaded = JsonStateStore.load(dir)
    assert(loaded.fileReferences.size == n)
    assert(loaded.currentVersion == 1 + n)
    // every version in the retention window reconstructs, snapshot or not
    val head = loaded.currentVersion
    val oldest = head - JsonStateStore.RetainedVersions
    Seq(oldest, oldest + 7, head - 1, head).foreach { v =>
      assert(JsonStateStore.loadAt(dir, v).fileReferences.size == v - 1, s"loadAt($v)")
    }
    // far older versions are pruned away
    intercept[IllegalStateException](JsonStateStore.loadAt(dir, 2))
  }

  test("every transaction type replays identically from the log (mixed chain, sparse snapshots)") {
    // force replay through MANY txn entries between snapshots
    val prev = System.getProperty("graft.state.snapshot.interval")
    System.setProperty("graft.state.snapshot.interval", "7")
    try {
      val dir = Files.createTempDirectory("graft-replay").toString
      val schema2 = GraftSchema(
        rowKeys = Seq(GraftField("k1", LongType), GraftField("k2", BinaryType)),
        sortKeys = Seq(GraftField("s", IntegerType)),
        values = Seq(GraftField("m", MapType(StringType, LongType), nullable = true)))
      val s = JsonStateStore.create(dir, schema2, PartitionTree.single(schema2))
      s.addFiles(Seq(FileReference("f1", "root", 10)))                       // v2 AddFiles
      s.splitPartition("root", 0, 42L, "a", "b")                             // v3 SplitPartition(long)
      s.splitFileReferences()                                                // v4 SplitFileRefs
      s.assignJob("job-1", "a", Seq("f1"))                                   // v5 AssignJob
      s.replaceFiles("a", Seq("f1"), FileReference("f2", "a", 5), nowMs = 99L) // v6 ReplaceFiles
      assert(s.addFilesIfAbsent("stream-x", 3L, Seq(FileReference("f3", "b", 7)))) // v7 + watermark (snapshot lands)
      s.splitPartition("b", 1, Array[Byte](1, 2), "b-a", "b-b")              // v8 SplitPartition(bytes)
      s.splitFileReferences()                                                // v9 (f1, f3 -> both children)
      s.removeFiles("b-a", Seq("f1"), nowMs = 123L)                          // v10 (f1 still in b-b)
      s.removeFiles("b-b", Seq("f1"), nowMs = 456L)                          // v11 f1 orphaned -> GC
      s.removeGCFiles(Seq("f1"))                                             // v12 RemoveGCFiles
      assert(s.currentVersion == 12)
      s.addTombstones(Seq(FileReference("t1", "b-a", 2)))                    // v13 AddTombstones
      assert(s.commitMergeIfAbsent("cdc-y", 1L,                              // v14 Merge + watermark
        Seq(FileReference("f4", "b-a", 3)), Seq(FileReference("t2", "b-a", 1))))
      s.commitMerge(Seq(FileReference("f5", "b-b", 4)), Nil)                 // v15 Merge (plain)
      assert(s.currentVersion == 15)
      // generation stamps: marker one below its merge's data files
      assert(s.tombstones.find(_.filename == "t2").get.seq + 1 ==
        s.fileReferences.find(_.filename == "f4").get.seq)

      // cold load replays from the latest snapshot
      val loaded = JsonStateStore.load(dir)
      assert(loaded.currentVersion == 15)
      assert(loaded.tombstones.toSet == s.tombstones.toSet)
      assert(loaded.lastTxnVersion("cdc-y").contains(1L))
      assert(loaded.schema == schema2)
      // byte-array split points compare by identity — normalize for equality
      def norm(p: graft.core.Partition) = (p.id, p.parentId, p.childIds, p.splitDimension,
        p.splitPoint.map { case b: Array[Byte] => b.toSeq; case x => x })
      assert(loaded.partitionTree.partitions.map(norm).toSet ==
        s.partitionTree.partitions.map(norm).toSet)
      assert(loaded.fileReferences.toSet == s.fileReferences.toSet)
      assert(loaded.unreferencedFiles == s.unreferencedFiles)
      assert(loaded.lastTxnVersion("stream-x").contains(3L))
      assert(loaded.unreferencedFiles.isEmpty) // f1 GC'd away at v12
      // time travel to versions with NO snapshot replays to exactly there;
      // the GC nowMs survives replay exactly (recorded IN the transaction)
      val at6 = JsonStateStore.loadAt(dir, 6)
      assert(at6.fileReferences.map(_.filename).toSet == Set("f1", "f2"))
      assert(at6.unreferencedFiles.isEmpty) // f1 still referenced in b at v6
      val at11 = JsonStateStore.loadAt(dir, 11)
      assert(at11.unreferencedFiles == Seq(GCEntry("f1", 456L, Some("root"))))
    } finally {
      if (prev == null) System.clearProperty("graft.state.snapshot.interval")
      else System.setProperty("graft.state.snapshot.interval", prev)
    }
  }

  test("removeFiles commits a pure removal and queues orphans with their home") {
    val s = newStore()
    val Seq(l, _) = leafIds(s)
    s.addFiles(Seq(FileReference("f1", l, 100), FileReference("f2", l, 50)))
    s.removeFiles(l, Seq("f1", "f2"), nowMs = 7L)
    assert(s.fileReferences.isEmpty)
    assert(s.unreferencedFiles.toSet ==
      Set(GCEntry("f1", 7L, Some(l)), GCEntry("f2", 7L, Some(l))))
    intercept[IllegalArgumentException](s.removeFiles(l, Seq("missing")))
  }

  test("addFilesIfAbsent commits once per (appId, version) and skips replays") {
    val dir = Files.createTempDirectory("graft-txn").toString
    val s = JsonStateStore.create(dir, schema, PartitionTree.fromSplitPoints(schema, Seq("m")))
    val Seq(l, _) = s.partitionTree.leaves.map(_.id).sorted
    assert(s.addFilesIfAbsent("stream-a", 1L, Seq(FileReference("f1", l, 10))))
    assert(s.lastTxnVersion("stream-a").contains(1L))
    // replay: same version, different file — nothing changes
    assert(!s.addFilesIfAbsent("stream-a", 1L, Seq(FileReference("f1-retry", l, 10))))
    assert(s.fileReferences.map(_.filename) == Seq("f1"))
    // the watermark survives persistence (crash-restart window) and is
    // ONE entry per app, not one per batch
    val reloaded = JsonStateStore.load(dir)
    assert(reloaded.lastTxnVersion("stream-a").contains(1L))
    assert(!reloaded.addFilesIfAbsent("stream-a", 1L, Seq(FileReference("f1-retry", l, 10))))
    assert(reloaded.addFilesIfAbsent("stream-a", 2L, Seq(FileReference("f2", l, 5))))
    assert(reloaded.lastTxnVersion("stream-a").contains(2L))
    // stale (below-watermark) versions are rejected too
    assert(!reloaded.addFilesIfAbsent("stream-a", 1L, Seq(FileReference("f3", l, 5))))
    // an independent app has its own watermark
    assert(reloaded.addFilesIfAbsent("stream-b", 1L, Seq(FileReference("g1", l, 7))))
  }

  test("commitMergeIfAbsent shares the watermark contract with addFilesIfAbsent") {
    val dir = Files.createTempDirectory("graft-merge-wm").toString
    val s = JsonStateStore.create(dir, schema, PartitionTree.fromSplitPoints(schema, Seq("m")))
    val Seq(l, _) = s.partitionTree.leaves.map(_.id).sorted
    assert(s.commitMergeIfAbsent("cdc-a", 1L,
      Seq(FileReference("f1", l, 10)), Seq(FileReference("t1", l, 2))))
    // replay: nothing changes — no duplicate puts, no duplicate markers
    assert(!s.commitMergeIfAbsent("cdc-a", 1L,
      Seq(FileReference("f1-retry", l, 10)), Seq(FileReference("t1-retry", l, 2))))
    assert(s.fileReferences.map(_.filename) == Seq("f1"))
    assert(s.tombstones.map(_.filename) == Seq("t1"))
    // the SAME watermark namespace as streaming ingest: a stream that
    // switched commit shapes mid-life still deduplicates
    assert(!s.addFilesIfAbsent("cdc-a", 1L, Seq(FileReference("f2", l, 5))))
    val reloaded = JsonStateStore.load(dir)
    assert(reloaded.lastTxnVersion("cdc-a").contains(1L))
    assert(reloaded.commitMergeIfAbsent("cdc-a", 2L, Seq(FileReference("f3", l, 5)), Nil))
  }

  test("load falls back past a corrupt latest snapshot with conservative quarantine") {
    val dir = Files.createTempDirectory("graft-corrupt").toString
    val s = JsonStateStore.create(dir, schema, PartitionTree.fromSplitPoints(schema, Seq("m")))
    val Seq(l, _) = s.partitionTree.leaves.map(_.id).sorted
    s.addFiles(Seq(FileReference("f1", l, 10))) // v2

    // a YOUNG empty latest may be a live writer's reservation: fall back
    // for this read but do NOT rename it away
    val v3 = java.nio.file.Paths.get(dir, "state-v3.json")
    Files.createFile(v3)
    val young = JsonStateStore.load(dir)
    assert(young.fileReferences.map(_.filename) == Seq("f1"))
    assert(young.currentVersion == 2)
    assert(Files.exists(v3), "young empty reservation must not be quarantined")

    // once STALE (no writer can still be filling it), it is quarantined
    Files.setLastModifiedTime(v3, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - JsonStateStore.QuarantineGraceMs - 1000))
    val loaded = JsonStateStore.load(dir)
    assert(loaded.currentVersion == 2)
    assert(!Files.exists(v3), "stale empty snapshot should be quarantined")
    assert(Files.exists(java.nio.file.Paths.get(dir, "state-v3.json.corrupt")))
    // the store is fully usable: the next commit takes v3 again
    loaded.addFiles(Seq(FileReference("f2", l, 5)))
    assert(loaded.currentVersion == 3)
    assert(JsonStateStore.load(dir).fileReferences.map(_.filename).toSet == Set("f1", "f2"))

    // NON-EMPTY garbage is definitely corrupt (fills are atomic moves):
    // quarantined immediately, no grace needed
    val v4 = java.nio.file.Paths.get(dir, "state-v4.json")
    Files.writeString(v4, "this is not json")
    val after = JsonStateStore.load(dir)
    assert(after.currentVersion == 3)
    assert(!Files.exists(v4) &&
      Files.exists(java.nio.file.Paths.get(dir, "state-v4.json.corrupt")))
  }

  test("many concurrent writers all land their transactions (stress)") {
    val dir = Files.createTempDirectory("graft-stress").toString
    JsonStateStore.create(dir, schema, PartitionTree.fromSplitPoints(schema, Seq("m")))
    val threads = 4; val perThread = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futures = (0 until threads).map { t =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          val store = JsonStateStore.load(dir)
          val leaf = store.partitionTree.leaves.map(_.id).min
          (0 until perThread).foreach { i =>
            store.addFiles(Seq(FileReference(s"w$t-f$i", leaf, 1)))
          }
        }
      })
    }
    futures.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdownNow()
    val finalStore = JsonStateStore.load(dir)
    assert(finalStore.fileReferences.size == threads * perThread)
    assert(finalStore.currentVersion == 1 + threads * perThread)
  }

  test("cross-process CAS: three JVMs hammering one table dir lose no updates") {
    // The in-process stress shares one page cache and one JVM's monitors;
    // rival ingest/compaction jobs in production are separate PROCESSES.
    // Spawn three child JVMs (same classpath) that each land 170 uniquely
    // named refs through the hard-link CAS — 510 contended commits — and
    // assert every single one is present with a dense version chain.
    val dir = Files.createTempDirectory("graft-xproc").toString
    JsonStateStore.create(dir, schema, PartitionTree.fromSplitPoints(schema, Seq("m")))
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val perWriter = 170
    val procs = (0 until 3).map { w =>
      new ProcessBuilder(javaBin, "-cp", cp, "graft.meta.CasHammer", dir, s"w$w", perWriter.toString)
        .redirectErrorStream(true).start()
    }
    procs.zipWithIndex.foreach { case (p, w) =>
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), s"writer $w did not finish")
      assert(p.exitValue() == 0, s"writer $w failed:\n$out")
      assert(out.contains(s"DONE $perWriter"), s"writer $w incomplete:\n$out")
    }
    val finalStore = JsonStateStore.load(dir)
    val names = finalStore.fileReferences.map(_.filename).toSet
    val expected = (for (w <- 0 until 3; i <- 0 until perWriter) yield s"w$w-f$i").toSet
    assert(names == expected, s"lost updates: ${(expected -- names).take(5)}...")
    assert(finalStore.currentVersion == 1 + 3 * perWriter)
  }

  test("cross-process batched committers: three JVMs, zero lost updates, folded versions") {
    // The reference funnels high commit rates through a batching
    // committer (statestore-committer-core). Here each of three rival
    // JVMs batches 8 in-process submitters through its CommitterQueue;
    // the CAS still arbitrates across processes, but each round-trip
    // carries a whole batch — versions written must come out well below
    // one per commit, with every commit durable.
    val dir = Files.createTempDirectory("graft-xproc-batch").toString
    JsonStateStore.create(dir, schema, PartitionTree.fromSplitPoints(schema, Seq("m")))
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val perWriter = 170
    val procs = (0 until 3).map { w =>
      new ProcessBuilder(javaBin, "-cp", cp, "graft.meta.CasHammer",
          dir, s"b$w", perWriter.toString, "--batch=8")
        .redirectErrorStream(true).start()
    }
    procs.zipWithIndex.foreach { case (p, w) =>
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), s"writer $w did not finish")
      assert(p.exitValue() == 0, s"writer $w failed:\n$out")
      assert(out.contains(s"DONE $perWriter"), s"writer $w incomplete:\n$out")
    }
    val finalStore = JsonStateStore.load(dir)
    val names = finalStore.fileReferences.map(_.filename).toSet
    val expected = (for (w <- 0 until 3; i <- 0 until perWriter) yield s"b$w-f$i").toSet
    assert(names == expected, s"lost updates: ${(expected -- names).take(5)}...")
    val versions = finalStore.currentVersion - 1
    assert(versions < 3 * perWriter / 2,
      s"expected batching to fold commits: $versions versions for ${3 * perWriter} commits")
    // every commit is its own generation even inside a batched version
    assert(finalStore.fileReferences.map(_.seq).distinct.size == 3 * perWriter)
  }

  test("readers are not blocked while a writer waits out an unreadable rival snapshot") {
    // Reserve the next version name with an EMPTY file (a crashed
    // fallback writer's husk). The next commit loses its CAS and must
    // wait out the quarantine grace — but that wait happens OUTSIDE the
    // store's monitor, so concurrent reads return immediately.
    val prev = System.getProperty("graft.state.quarantine.grace.ms")
    System.setProperty("graft.state.quarantine.grace.ms", "3000")
    try {
      val dir = Files.createTempDirectory("graft-noblock").toString
      val store = JsonStateStore.create(dir, schema, PartitionTree.fromSplitPoints(schema, Seq("m")))
      val leaf = store.partitionTree.leaves.map(_.id).min
      Files.createFile(java.nio.file.Paths.get(dir, "txn-v2.json")) // unreadable rival
      val writer = new Thread(() => {
        try store.addFiles(Seq(FileReference("f1", leaf, 1)))
        catch { case _: Throwable => () }
      })
      writer.start()
      Thread.sleep(300) // writer is now inside the grace-window wait
      val t0 = System.nanoTime()
      val leaves = store.partitionTree.leaves.size
      val refs = store.fileReferences.size
      val readMs = (System.nanoTime() - t0) / 1e6
      assert(leaves == 2 && refs == 0)
      assert(readMs < 1000, s"reader blocked ${readMs}ms behind the writer's grace wait")
      writer.join(30000)
      assert(!writer.isAlive, "writer never finished")
      // past the grace the husk is quarantined and the commit lands
      assert(JsonStateStore.load(dir).fileReferences.map(_.filename) == Seq("f1"))
    } finally {
      if (prev == null) System.clearProperty("graft.state.quarantine.grace.ms")
      else System.setProperty("graft.state.quarantine.grace.ms", prev)
    }
  }

  test("CoordinatedCAS: external conditional put keeps concurrent writers serialized") {
    // the object-store deployment shape: snapshots live in the table dir
    // (stand-in for s3a://), the conditional put happens in a separate
    // coordination dir — no writer may ever clobber a committed rival
    val dir = Files.createTempDirectory("graft-coord-data").toString
    val coord = Files.createTempDirectory("graft-coord-log").toString
    JsonStateStore.create(dir, schema, PartitionTree.fromSplitPoints(schema, Seq("m")),
      cas = Some(new CoordinatedCAS(coord)))
    val threads = 4; val perThread = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futures = (0 until threads).map { t =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          val store = JsonStateStore.load(dir, cas = Some(new CoordinatedCAS(coord)))
          val leaf = store.partitionTree.leaves.map(_.id).min
          (0 until perThread).foreach { i =>
            store.addFiles(Seq(FileReference(s"c$t-f$i", leaf, 1)))
          }
        }
      })
    }
    futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdownNow()
    val fin = JsonStateStore.load(dir, cas = Some(new CoordinatedCAS(coord)))
    assert(fin.fileReferences.size == threads * perThread)
    assert(fin.currentVersion == 1 + threads * perThread)
  }

  test("CoordinatedCAS: a rival repairs a writer that crashed between claim and fill") {
    val dir = Files.createTempDirectory("graft-repair-data").toString
    val coord = Files.createTempDirectory("graft-repair-log").toString
    val cas = new CoordinatedCAS(coord)
    val store = JsonStateStore.create(dir, schema,
      PartitionTree.fromSplitPoints(schema, Seq("m")), cas = Some(cas)) // v1
    val leaf = store.partitionTree.leaves.map(_.id).min

    // simulate a writer that staged its v2 transaction and claimed it,
    // then died before filling txn-v2.json (the liveness hole a naive
    // claim-then-upload protocol wedges on forever)
    val uuid = "crashed-writer-uuid"
    val crashedTxn =
      s"""{"txn":"addFiles","refs":[{"filename":"crashed","partitionId":"$leaf","rowCount":1,"dataChange":true}]}"""
    Files.writeString(java.nio.file.Paths.get(dir, s".staged-$uuid.json"), crashedTxn)
    Files.writeString(java.nio.file.Paths.get(coord, "txn-v2.json.claim"), uuid)
    assert(!Files.exists(java.nio.file.Paths.get(dir, "txn-v2.json")))

    // a live writer: loses the v2 claim, repairs the crashed fill (the
    // crashed writer's transaction becomes visible), and lands its own
    // transaction at v3 — nothing wedges, nothing is lost
    store.addFiles(Seq(FileReference("alive", leaf, 1)))
    assert(Files.exists(java.nio.file.Paths.get(dir, "txn-v2.json")), "crashed fill not repaired")
    assert(store.currentVersion == 3)
    assert(store.fileReferences.map(_.filename).toSet == Set("crashed", "alive"))
    val fin = JsonStateStore.load(dir, cas = Some(cas))
    assert(fin.fileReferences.map(_.filename).toSet == Set("crashed", "alive"))
  }

  test("casFor refuses rename-CAS on object-store schemes without an explicit CAS") {
    // a FileSystem whose URI claims s3a://; rename there is copy+delete,
    // not a conditional put — silently defaulting to RenameCAS would risk
    // lost updates exactly where the storage port claims S3 support
    val s3ish = new org.apache.hadoop.fs.RawLocalFileSystem {
      override def getUri: java.net.URI = java.net.URI.create("s3a://bucket")
    }
    val e = intercept[IllegalArgumentException] { GraftFS.casFor(s3ish) }
    assert(e.getMessage.contains("StateStoreCAS"))
    // hdfs-like schemes keep rename-without-overwrite, file keeps hard links
    val hdfsish = new org.apache.hadoop.fs.RawLocalFileSystem {
      override def getUri: java.net.URI = java.net.URI.create("hdfs://nn")
    }
    assert(GraftFS.casFor(hdfsish) == RenameCAS)
    val local = new org.apache.hadoop.fs.RawLocalFileSystem {
      override def getUri: java.net.URI = java.net.URI.create("file:///")
    }
    assert(GraftFS.casFor(local) == HardLinkCAS)
  }
}
