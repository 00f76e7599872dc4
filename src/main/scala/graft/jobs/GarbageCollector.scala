package graft.jobs

import graft.meta.GraftFS
import graft.table.GraftTable

/** Garbage collection (M5): physically delete files that have had zero
  * references for longer than the configured delay — queries planned
  * against an older state snapshot may still be reading younger ones
  * (reference: GarbageCollector.java, docs/design.md:331-343). Deletes
  * go through the Hadoop FileSystem API, so they work against whatever
  * store holds the table.
  */
final class GarbageCollector(table: GraftTable) {

  /** Returns filenames deleted. */
  def run(nowMs: Long = System.currentTimeMillis()): Seq[String] = {
    table.store.assertWritable() // a snapshot must never delete the live table's files
    val delayMs = table.config.gcDelayMinutes * 60000L
    val ready = table.store.unreferencedFiles.filter(e => nowMs - e.sinceMs >= delayMs)
    val deleted = ready.map { entry =>
      // O(1) path via the queue entry's homeId; the directory scan is the
      // migration fallback for entries queued before homeId existed
      // (mirrors GraftTable.pathOf) — never O(files × partitions) for new
      // entries.
      val p =
        if (GraftFS.isExternalName(entry.filename)) None
        // ^ a shallow clone's inherited file: the SOURCE table owns it —
        //   the clone clears its queue entry but must never delete it
        else entry.homeId
          .map(h => s"${table.dataDir}/$h/${entry.filename}")
          .filter(GraftFS.exists)
          .orElse(locate(entry.filename))
      p.foreach { path =>
        GraftFS.delete(path)
        GraftFS.delete(path + ".sketches")
      }
      entry.filename // already-gone files still clear from the queue
    }
    table.store.removeGCFiles(deleted)
    deleted
  }

  private def locate(filename: String): Option[String] = {
    val (fs, _) = GraftFS.resolve(table.dataDir)
    GraftFS.list(table.dataDir)
      .map(st => new org.apache.hadoop.fs.Path(st.getPath, filename))
      .find(fs.exists)
      .map(_.toString)
  }
}
