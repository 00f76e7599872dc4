package graft.meta

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, LocalFileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop `Configuration` with Java serialization, so executor-side code
  * (merge tasks, scan readers) resolves filesystems with the DRIVER's
  * configuration — credentials, fs.defaultFS, connector tuning — instead
  * of an empty default. (Spark ships its own equivalent to every built-in
  * source; it is `private[spark]`, hence this 12-line twin.)
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Every table-side file operation (state snapshots, data-file moves, GC
  * deletes, sketch sidecars) resolves through the Hadoop FileSystem API,
  * so a table directory may live on any Hadoop-supported store —
  * `file://`, `hdfs://`, `s3a://` — not only the local POSIX filesystem.
  * The reference's tables live in object storage by design
  * (reference: docs/design.md:55-72); binding IO to `java.nio` was the
  * one thing keeping this engine single-machine.
  *
  * Scheme-less paths resolve against the active Spark session's
  * `hadoopConfiguration` (`fs.defaultFS`). The local filesystem is used
  * RAW (no `.crc` checksum shadow files): graft's own commit protocol
  * (atomic create-exclusive snapshots, rename-into-place data files)
  * provides the integrity the checksum layer would, and raw rename/link
  * semantics are what the CAS relies on.
  */
object GraftFS {

  /** Driver-side configuration: the active session's, else a default. */
  def conf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def serializableConf: SerializableHadoopConf = new SerializableHadoopConf(conf)

  /** FileSystem + qualified Path for a path string (any scheme). */
  def resolve(path: String, c: Configuration = conf): (FileSystem, Path) = {
    val p = new Path(path)
    val fs = p.getFileSystem(c) match {
      case l: LocalFileSystem => l.getRawFileSystem // POSIX semantics, no .crc shadows
      case other => other
    }
    (fs, p)
  }

  def exists(path: String): Boolean = {
    val (fs, p) = resolve(path)
    fs.exists(p)
  }

  def mkdirs(path: String): Unit = {
    val (fs, p) = resolve(path)
    fs.mkdirs(p)
  }

  /** Idempotent single-file delete; returns whether anything was deleted. */
  def delete(path: String): Boolean = {
    val (fs, p) = resolve(path)
    try fs.delete(p, false) catch { case _: java.io.FileNotFoundException => false }
  }

  def deleteRecursive(path: String): Unit = {
    val (fs, p) = resolve(path)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Children of a directory; empty if it doesn't exist. */
  def list(path: String): Seq[FileStatus] = {
    val (fs, p) = resolve(path)
    if (!fs.exists(p)) Nil else fs.listStatus(p).toSeq
  }

  /** Move within one filesystem (atomic on local/HDFS — the stores where
    * rename is rename; an object-store "rename" is the FS connector's
    * copy+delete, which is why commits go through the state store, not
    * file presence).
    */
  def rename(src: Path, dst: Path, fs: FileSystem): Unit = {
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
  }

  def readBytes(path: String): Array[Byte] = {
    val (fs, p) = resolve(path)
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }

  def readString(path: String): String = new String(readBytes(path), UTF_8)

  def writeBytes(path: String, bytes: Array[Byte]): Unit = {
    val (fs, p) = resolve(path)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  def writeString(path: String, s: String): Unit = writeBytes(path, s.getBytes(UTF_8))

  def length(path: String): Long = {
    val (fs, p) = resolve(path)
    fs.getFileStatus(p).getLen
  }

  /** Schemes whose connectors implement `rename` as a non-atomic
    * copy+delete over a racy existence pre-check — RenameCAS on these can
    * silently discard a rival writer's committed transaction.
    */
  private val ObjectStoreSchemes =
    Set("s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss", "cos", "cosn", "swift")

  /** The CAS implementation matching a filesystem's primitives.
    * Object-store schemes have NO filesystem primitive that can express a
    * conditional put, so they require an explicit external
    * [[StateStoreCAS]] (the reference pairs S3 data with a DynamoDB
    * transaction log for exactly this reason,
    * docs/design/transaction-log-state-store.md) — defaulting to
    * RenameCAS there would hand users silent lost-update risk. The
    * `graft.state.cas.allow.rename` system property overrides for stores
    * known to rename atomically (e.g. S3 Express directory buckets).
    */
  def casFor(fs: FileSystem): StateStoreCAS = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    if (scheme == "file") HardLinkCAS
    else if (ObjectStoreSchemes.contains(scheme)
        && !java.lang.Boolean.getBoolean("graft.state.cas.allow.rename"))
      throw new IllegalArgumentException(
        s"scheme '$scheme' cannot express an atomic compare-and-set through filesystem rename; " +
        "pass an explicit StateStoreCAS (external conditional-put store) when creating/loading " +
        "the table, or set -Dgraft.state.cas.allow.rename=true if this store's rename is atomic")
    else RenameCAS
  }
}

/** Conditional publish of a state-store snapshot: put the fully-written
  * `tmp` file at `target` iff `target` does not exist, atomically — the
  * compare-and-set that serializes writers. This is the seam where an
  * external conditional-put store (the reference's DynamoDB transaction
  * log, docs/design/transaction-log-state-store.md) slots in for stores
  * whose filesystem primitives can't express a CAS (S3's rename is a
  * non-atomic copy+delete).
  */
trait StateStoreCAS {
  /** true = this writer owns `target`; false = lost the race. An
    * implementation must NEVER clobber an existing target — that would
    * silently discard the rival's committed transaction.
    */
  def publish(fs: FileSystem, tmp: Path, target: Path): Boolean
}

/** Local-filesystem CAS: `link(2)` the written tmp onto the version name.
  * Hard-linking fails with EEXIST when the name is taken — a true O_EXCL
  * CAS with no window where the target is visible but unfilled (unlike
  * create-then-fill). Filesystems without hard links fall back to
  * reserve-exclusive-then-fill; readers may momentarily see an empty
  * latest version there, which `loadLatestParseable` tolerates.
  */
object HardLinkCAS extends StateStoreCAS {
  import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption}

  override def publish(fs: FileSystem, tmp: Path, target: Path): Boolean = {
    val t = Paths.get(tmp.toUri.getPath)
    val g = Paths.get(target.toUri.getPath)
    try { Files.createLink(g, t); true }
    catch {
      case _: FileAlreadyExistsException => false
      case _: UnsupportedOperationException =>
        try Files.createFile(g)
        catch { case _: FileAlreadyExistsException => return false }
        Files.move(t, g, StandardCopyOption.REPLACE_EXISTING)
        true
    }
  }
}

/** HDFS-style CAS: `rename` is atomic and fails (returns false) when the
  * destination exists, so rename-without-overwrite IS the conditional
  * put. Correct on HDFS and HDFS-semantics stores; NOT safe on raw
  * object stores (S3A rename = copy+delete with a racy existence check) —
  * those need an external CAS via the [[StateStoreCAS]] seam, exactly as
  * the reference pairs S3 data with a DynamoDB transaction log.
  */
object RenameCAS extends StateStoreCAS {
  override def publish(fs: FileSystem, tmp: Path, target: Path): Boolean = {
    if (fs.exists(target)) return false
    try fs.rename(tmp, target)
    catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
  }
}
