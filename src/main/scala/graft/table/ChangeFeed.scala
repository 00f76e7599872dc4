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
private[table] object ChangeFeed {

  /** (version, filename, home partition dir, isTombstone) for every data
    * file ingested (dataChange) or tombstone registered in `(from, to]`.
    */
  def walk(meta: String, from: Long, to: Long): Seq[(Long, String, String, Boolean)] = {
    val out = Seq.newBuilder[(Long, String, String, Boolean)]
    // fallback snapshot cache: consecutive fallbacks reuse the previous
    // iteration's endpoint
    var cached: (Long, Snap) = null
    def snapAt(v: Long): Snap = {
      if (cached == null || cached._1 != v) cached = (v, loadSnap(meta, v, (from, to)))
      cached._2
    }
    var v = from + 1
    while (v <= to) {
      JsonStateStore.deltaAddedAt(meta, v) match {
        case Some(entries) =>
          entries.foreach { e =>
            if (e.tombstone) out += ((v, e.filename, e.home, true))
            else if (e.dataChange) out += ((v, e.filename, e.home, false))
          }
        case None =>
          val prev = snapAt(v - 1)
          val cur = loadSnap(meta, v, (from, to))
          cached = (v, cur)
          cur.files.foreach { case (name, (home, dataChange)) =>
            if (dataChange && !prev.files.contains(name)) out += ((v, name, home, false))
          }
          cur.tombs.foreach { case (name, home) =>
            if (!prev.tombs.contains(name)) out += ((v, name, home, true))
          }
      }
      v += 1
    }
    out.result()
  }

  private final case class Snap(
      files: Map[String, (String, Boolean)],
      tombs: Map[String, String])

  private def loadSnap(meta: String, v: Long, window: (Long, Long)): Snap =
    if (v <= 0L) Snap(Map.empty, Map.empty)
    else try {
      val st = JsonStateStore.loadAt(meta, v)
      Snap(
        st.fileReferences.map(r => r.filename -> (r.physicalPartitionId, r.dataChange)).toMap,
        st.tombstones.map(r => r.filename -> r.physicalPartitionId).toMap)
    } catch {
      case e: IllegalStateException => throw new IllegalStateException(
        s"change feed cannot recover: version $v inside the window " +
          s"(${window._1}, ${window._2}] is no longer retained — widen the " +
          "snapshot retention or diff from a newer base version", e)
    }
}
