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
    val ready = table.store.unreferencedFiles.collect {
      case (f, since) if nowMs - since >= delayMs => f
    }
    val deleted = ready.filter { filename =>
      locate(filename) match {
        case Some(p) =>
          Files.deleteIfExists(p)
          Files.deleteIfExists(Paths.get(p.toString + ".sketches"))
          true
        case None => true // already gone; still clear from the queue
      }
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
