package graft.jobs

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.table.GraftTable

/** Garbage collection (M5): physically delete files that have had zero
  * references for longer than the configured delay — queries planned
  * against an older state snapshot may still be reading younger ones
  * (reference: GarbageCollector.java, docs/design.md:331-343).
  */
final class GarbageCollector(table: GraftTable) {

  /** Returns filenames deleted. */
  def run(nowMs: Long = System.currentTimeMillis()): Seq[String] = {
    val delayMs = table.config.gcDelayMinutes * 60000L
    val ready = table.store.unreferencedFiles.filter(e => nowMs - e.sinceMs >= delayMs)
    val deleted = ready.map { entry =>
      // O(1) path via the queue entry's homeId; the directory scan is the
      // migration fallback for entries queued before homeId existed
      // (mirrors GraftTable.pathOf) — never O(files × partitions) for new
      // entries.
      val p = entry.homeId
        .map(h => Paths.get(table.dataDir, h, entry.filename))
        .filter(Files.exists(_))
        .orElse(locate(entry.filename))
      p.foreach { path =>
        Files.deleteIfExists(path)
        Files.deleteIfExists(Paths.get(path.toString + ".sketches"))
      }
      entry.filename // already-gone files still clear from the queue
    }
    table.store.removeGCFiles(deleted)
    deleted
  }

  private def locate(filename: String): Option[java.nio.file.Path] = {
    val root = Paths.get(table.dataDir)
    if (!Files.exists(root)) return None
    Files.list(root).iterator().asScala
      .map(_.resolve(filename))
      .find(Files.exists(_))
  }
}
