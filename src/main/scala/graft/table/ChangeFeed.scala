package graft.table

import graft.meta.JsonStateStore

/** Version-window walker for the batch change feed (CDC): the files
  * committed in `(from, to]`, classified as data files (ingested rows,
  * compaction outputs excluded via dataChange=false) or tombstone files
  * (row-key deletes).
  *
  * EVERY version in the window is walked, not just the endpoints diffed
  * — the same completeness argument as the table-changes stream
  * (graft.sources.GraftMicroBatchStream.planInputPartitions): a file
  * ingested and compacted away inside the window, or a tombstone added
  * and retired by a purge inside it, exists in neither endpoint snapshot
  * and an endpoint diff would silently lose it. The normal path reads
  * the O(changes) per-version delta manifests; a version missing its
  * manifest falls back to diffing that version's snapshot against its
  * predecessor's (predecessor parse cached, so an all-fallback window
  * parses each snapshot once). Filenames are UUIDs (never reused), so
  * per-version added sets are pairwise disjoint.
  */
private[graft] object ChangeFeed {

  /** One changed file in the window: a data file ingested (dataChange)
    * or a tombstone registered. `seq` is the file's write-generation as
    * committed — the WITHIN-version commit order, which distinguishes
    * the logical commits of a batched-committer version (several
    * generations can share one log version; the version alone cannot
    * order them).
    */
  final case class Entry(version: Long, filename: String, home: String,
      isTombstone: Boolean, seq: Long)

  def walk(meta: String, from: Long, to: Long): Seq[Entry] = {
    val out = Seq.newBuilder[Entry]
    // fallback snapshot cache: consecutive fallbacks reuse the previous
    // iteration's endpoint
    var cached: (Long, Snap) = null
    def snapAt(v: Long): Snap = {
      if (cached == null || cached._1 != v) cached = (v, loadSnap(meta, v, (from, to)))
      cached._2
    }
    var v = from + 1
    while (v <= to) {
      val delta = JsonStateStore.deltaAddedAt(meta, v)
      // a RESTORE version is a reset diff, never an added-files list;
      // its manifest is empty, so the marker check only runs for the
      // (rare) empty-manifest versions and the manifest-less fallback
      val isRestore = delta.forall(_.isEmpty) && JsonStateStore.isRestoreAt(meta, v)
      if (isRestore) {
        out ++= restoreEvents(meta, v, (from, to), snapAt)
        // subsequent fallback diffs start from the restored state
        cached = (v, loadSnap(meta, v, (from, to)))
      } else delta match {
        case Some(entries) =>
          entries.foreach { e =>
            if (e.tombstone) out += Entry(v, e.filename, e.home, true, e.seq)
            else if (e.dataChange) out += Entry(v, e.filename, e.home, false, e.seq)
          }
        case None =>
          val prev = snapAt(v - 1)
          val cur = loadSnap(meta, v, (from, to))
          cached = (v, cur)
          cur.files.foreach { case (name, (home, dataChange, seq)) =>
            if (dataChange && !prev.files.contains(name))
              out += Entry(v, name, home, false, seq)
          }
          cur.tombs.foreach { case (name, (home, seq)) =>
            if (!prev.tombs.contains(name)) out += Entry(v, name, home, true, seq)
          }
      }
      v += 1
    }
    out.result()
  }

  /** A RESTORE version as CDC: subscribers materializing the feed per
    * key by (version, seq) must converge to the RESTORED table, so the
    * version delivers a reset diff —
    *
    *  1. RETRACTIONS: every data file live at v-1 but absent from the
    *     restored state is re-delivered as a delete (its keys), stamped
    *     one seq above every generation seen so far — keys that were
    *     only added after the restore target end absent;
    *  2. RE-PUTS: every file AND pending marker of the restored state is
    *     re-delivered above the retraction with fresh seqs PRESERVING
    *     their relative order, so per-key resolution inside the
    *     re-delivered set equals the restored table's own reads (stale
    *     post-target generations in the subscriber lose to the higher
    *     (version, seq), and delete-then-reingest inside the restored
    *     state still resolves by its original generation order).
    *
    * O(pre-state ∪ restored-state files) events — a restore is an admin
    * reset; completeness over manifest-sized increments. Same
    * bounded-history contract as the rest of the feed: the rolled-back
    * files sit in the GC queue, so a subscriber must drain the window
    * within the GC delay.
    */
  private def restoreEvents(meta: String, v: Long, window: (Long, Long),
      snapAt: Long => Snap): Seq[Entry] = {
    val pre = snapAt(v - 1)
    val post = loadSnap(meta, v, window)
    val maxSeen = (pre.files.values.map(_._3) ++ pre.tombs.values.map(_._2) ++
      post.files.values.map(_._3) ++ post.tombs.values.map(_._2))
      .maxOption.getOrElse(0L)
    val retractSeq = maxSeen + 1
    val retractions = pre.files.toSeq
      .filterNot { case (name, _) => post.files.contains(name) }
      .sortBy(_._1)
      .map { case (name, (home, _, _)) => Entry(v, name, home, true, retractSeq) }
    val items = post.files.toSeq.map { case (n, (h, _, s)) => (n, h, false, s) } ++
      post.tombs.toSeq.map { case (n, (h, s)) => (n, h, true, s) }
    val rank = items.map(_._4).distinct.sorted.zipWithIndex.toMap
    val reputs = items.sortBy(_._4).map { case (n, h, tomb, s) =>
      Entry(v, n, h, tomb, retractSeq + 1 + rank(s))
    }
    retractions ++ reputs
  }

  private final case class Snap(
      files: Map[String, (String, Boolean, Long)],
      tombs: Map[String, (String, Long)])

  private def loadSnap(meta: String, v: Long, window: (Long, Long)): Snap =
    if (v <= 0L) Snap(Map.empty, Map.empty)
    else try {
      val st = JsonStateStore.loadAt(meta, v)
      Snap(
        st.fileReferences
          .map(r => r.filename -> (r.physicalPartitionId, r.dataChange, r.seq)).toMap,
        st.tombstones.map(r => r.filename -> (r.physicalPartitionId, r.seq)).toMap)
    } catch {
      case e: IllegalStateException => throw new IllegalStateException(
        s"change feed cannot recover: version $v inside the window " +
          s"(${window._1}, ${window._2}] is no longer retained — widen the " +
          "snapshot retention or diff from a newer base version", e)
    }
}
