package graft.meta

import java.net.URI
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-only Hadoop filesystem emulating an object store's weak
  * primitives over local disk, registered under `objstore://`:
  *
  *  - `rename` is a NON-ATOMIC copy-then-delete with NO overwrite
  *    detection (it silently clobbers an existing destination) — the
  *    S3A-style semantics `GraftFS.casFor` refuses to build a rename-CAS
  *    on;
  *  - crash injection: [[EmulatedObjectStoreFS.armCrash]] arms a
  *    one-shot IOException on the Nth create/rename touching a path
  *    substring — how the lifecycle stress kills writers between the
  *    CoordinatedCAS stage/claim/fill steps.
  *
  * Spark/parquet and the engine's data path run unmodified against it;
  * only the state-store CAS must come from outside (CoordinatedCAS with
  * a real coordination dir), exactly the deployment contract.
  */
class EmulatedObjectStoreFS extends RawLocalFileSystem {
  import EmulatedObjectStoreFS.maybeCrash

  override def getUri: URI = URI.create("objstore:///")

  // both create primitives: RawLocalFileSystem routes the plain
  // overloads (fs.create(p, true)) through the non-permission variant
  // and the permissioned API through the other
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    maybeCrash("create", f)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    maybeCrash("create", f)
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }

  /** Copy-then-delete, directories included; clobbers the destination. */
  override def rename(src: Path, dst: Path): Boolean = {
    maybeCrash("rename", dst)
    val s = pathToFile(src)
    val d = pathToFile(dst)
    if (!s.exists()) return false
    copyTree(s, d)
    deleteTree(s)
    true
  }

  private def copyTree(s: java.io.File, d: java.io.File): Unit = {
    if (s.isDirectory) {
      d.mkdirs()
      Option(s.listFiles()).getOrElse(Array.empty)
        .foreach(c => copyTree(c, new java.io.File(d, c.getName)))
    } else {
      Option(d.getParentFile).foreach(_.mkdirs())
      java.nio.file.Files.copy(s.toPath, d.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete()
  }
}

object EmulatedObjectStoreFS {
  /** (op, path-substring) -> remaining matches before the one-shot throw. */
  private val armed = new ConcurrentHashMap[(String, String), AtomicInteger]()
  private val fired = new AtomicInteger(0)

  /** Arm a one-shot injected crash: the (`afterN`+1)-th `op` whose path
    * contains `substr` throws IOException.
    */
  def armCrash(op: String, substr: String, afterN: Int = 0): Unit =
    armed.put((op, substr), new AtomicInteger(afterN))

  def disarmAll(): Unit = armed.clear()

  def firedCount: Int = fired.get()

  private def maybeCrash(op: String, path: Path): Unit = {
    val it = armed.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == op && path.toString.contains(e.getKey._2)) {
        if (e.getValue.getAndDecrement() == 0) {
          armed.remove(e.getKey)
          fired.incrementAndGet()
          throw new java.io.IOException(
            s"injected crash: $op on $path")
        }
      }
    }
  }
}
