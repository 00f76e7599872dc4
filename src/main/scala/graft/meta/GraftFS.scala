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
  * source; it is `private[spark]`, hence this twin.)
  *
  * Wire format is a flat sorted (key, value) string array, NOT
  * `Configuration.write`: Hadoop's Writable form gzip-compresses every
  * entry separately, so `readFields` allocates ~1k `Inflater`s and
  * throws ~1k internal `EOFException`s PER TASK — profiled at ~100
  * thread-seconds over one bench scale pass. Deserialized instances are
  * also cached per JVM by a SHA-256 of the payload: every task of a
  * stage carries the same conf, so after the first task the cost is one
  * digest plus a cheap copy-constructor call. Each deserialization gets
  * its own COPY of the cached master, so a library that sets a key on
  * the conf it was handed cannot contaminate other tasks; the cache is
  * bounded so long sessions with churning confs cannot grow it without
  * limit.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    val it = value.iterator()
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val e = it.next()
      buf += e.getKey
      buf += e.getValue
    }
    out.writeObject(buf.toArray)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    val flat = in.readObject().asInstanceOf[Array[String]]
    val md = java.security.MessageDigest.getInstance("SHA-256")
    flat.foreach { s =>
      md.update(s.getBytes(UTF_8))
      md.update(0.toByte)
    }
    val key = java.util.Base64.getEncoder.encodeToString(md.digest())
    val master = SerializableHadoopConf.cache.computeIfAbsent(key, { _ =>
      if (SerializableHadoopConf.cache.size() >= 64)
        SerializableHadoopConf.cache.clear() // bound growth across long sessions
      val c = new Configuration(false)
      var i = 0
      while (i < flat.length - 1) {
        c.set(flat(i), flat(i + 1))
        i += 2
      }
      c
    })
    // defensive copy per deserialization: the parse (the expensive part)
    // is amortized by the cache, while any library that sets a key on
    // the handed-out conf mutates a private copy, not a JVM-shared one
    value = new Configuration(master)
  }
}

object SerializableHadoopConf {
  // deserialized-conf dedupe; a JVM sees a handful of distinct confs
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Configuration]()
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

  /** True when a state-store filename is a full path rather than a plain
    * name — the shallow-clone representation: a clone's inherited
    * references carry the OWNING table's qualified file path verbatim
    * (Delta's shallow-clone absolute-path contract), while files the
    * clone writes itself are plain names under its own data dir. A plain
    * name never contains a separator, so the test is exact.
    */
  def isExternalName(name: String): Boolean = name.contains("/")

  /** Resolve a file reference's physical location: external (absolute)
    * names stand alone; plain names live under the table's own
    * `<dir>/data/<home>/` layout.
    */
  def dataPath(tableDir: String, home: String, filename: String): String =
    if (isExternalName(filename)) filename else s"$tableDir/data/$home/$filename"

  /** Byte copy src → dst (overwrite), each path's filesystem resolved
    * from `c` — executor-safe when the driver conf ships via
    * [[SerializableHadoopConf]]. Used by the deep-clone data copy.
    */
  def copyFile(srcStr: String, dstStr: String, c: Configuration): Unit = {
    val src = new Path(srcStr); val dst = new Path(dstStr)
    val sfs = src.getFileSystem(c); val dfs = dst.getFileSystem(c)
    dfs.mkdirs(dst.getParent)
    val in = sfs.open(src)
    try {
      val out = dfs.create(dst, true)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally out.close()
    } finally in.close()
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

/** The arbitration primitive behind [[ClaimArbitratedCAS]]: a named
  * conditional put — create claim `name` carrying `uuid` atomically,
  * succeeding for exactly one writer. This is the ONLY operation that
  * must be remote-atomic in the whole commit protocol (the reference
  * isolates the same primitive in DynamoDB's conditional PutItem,
  * docs/design/transaction-log-state-store.md); everything else is
  * unique-named uploads and idempotent copies. Implementations:
  * [[FsClaimStore]] (a coordination filesystem) and
  * [[graft.meta.HttpClaimStore]] (a remote conditional-put service).
  */
trait ClaimStore {
  /** Atomically create claim `name` with content `uuid`; true iff THIS
    * call created it. Must never overwrite an existing claim, and the
    * content must be visible atomically with the claim (no empty-claim
    * window — repairers read it).
    */
  def tryClaim(name: String, uuid: String): Boolean
  def readClaim(name: String): Option[String]
  def deleteClaim(name: String): Unit
  /** All current (name, uuid) claims — O(retention) by pruning. */
  def listClaims(): Seq[(String, String)]
}

/** Filesystem-backed [[ClaimStore]]: claims are `<name>.claim` files in
  * a coordination directory whose store CAN express a conditional put
  * (HDFS-like rename-without-overwrite, hard links on file://). The
  * claim content travels atomically with publication: written to a tmp
  * first, then linked/renamed into place by the directory's own CAS
  * primitive — a raw local rename would silently OVERWRITE a rival's
  * claim, and `casFor` rejects an object-store coordination dir
  * outright, which is exactly right.
  */
final class FsClaimStore(coordDir: String) extends ClaimStore {
  import java.nio.charset.StandardCharsets.UTF_8

  private def resolved: (FileSystem, Path) = {
    val (cfs, cdir) = GraftFS.resolve(coordDir)
    cfs.mkdirs(cdir)
    (cfs, cdir)
  }

  override def tryClaim(name: String, uuid: String): Boolean = {
    val (cfs, cdir) = resolved
    val claim = new Path(cdir, name + ".claim")
    val claimTmp = new Path(cdir, s".$name.$uuid.tmp")
    val out = cfs.create(claimTmp, true)
    try out.write(uuid.getBytes(UTF_8)) finally out.close()
    val won = GraftFS.casFor(cfs).publish(cfs, claimTmp, claim)
    try cfs.delete(claimTmp, false) catch { case scala.util.control.NonFatal(_) => () }
    won
  }

  override def readClaim(name: String): Option[String] = {
    val (cfs, cdir) = resolved
    val claim = new Path(cdir, name + ".claim")
    try {
      val in = cfs.open(claim)
      val s = try new String(in.readAllBytes(), UTF_8).trim finally in.close()
      if (s.isEmpty) None else Some(s)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  override def deleteClaim(name: String): Unit = {
    val (cfs, cdir) = resolved
    try cfs.delete(new Path(cdir, name + ".claim"), false)
    catch { case scala.util.control.NonFatal(_) => () }
  }

  override def listClaims(): Seq[(String, String)] = {
    val (cfs, cdir) = resolved
    cfs.listStatus(cdir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (!n.endsWith(".claim")) None
      else {
        val name = n.stripSuffix(".claim")
        try {
          val in = cfs.open(st.getPath)
          val s = try new String(in.readAllBytes(), UTF_8).trim finally in.close()
          Some(name -> s)
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }
}

/** External CAS for object-store tables: arbitration happens on a
  * [[ClaimStore]] that CAN express a conditional put, while the
  * snapshot bytes live wherever the table lives. This is the
  * reference's S3-data + DynamoDB-transaction-log split
  * (docs/design/transaction-log-state-store.md) with the log behind
  * the pluggable claim primitive. The protocol is crash-safe at every
  * step:
  *
  *  1. STAGE: the snapshot uploads to a uuid-named object next to the
  *     table (unique name — always safe, no coordination needed);
  *  2. CLAIM: `tryClaim(<version>, uuid)` — the atomic winner-takes-all,
  *     carrying its content atomically (no empty-claim window);
  *  3. FILL: the version object is copied from the staged object. The
  *     fill is IDEMPOTENT — the claim pins which uuid fills the version,
  *     so ANY writer can (re)do it: a rival that loses the claim first
  *     REPAIRS the winner's fill if the winner crashed between 2 and 3,
  *     which is what keeps a crashed writer from wedging the version
  *     chain forever.
  *
  * Readers never consult the claim store — an unfilled version reads as
  * an absent snapshot, which `loadLatestParseable` tolerates (falls
  * back one version) until a writer repairs it. Claims and staged
  * objects far behind the committed version are pruned opportunistically
  * on publish.
  */
class ClaimArbitratedCAS(claims: ClaimStore) extends StateStoreCAS {
  // both commit-record kinds arbitrate through claims: the v1 snapshot
  // and every transaction-log entry
  private val VersionName = "(?:state|txn)-v(\\d+)\\.json".r

  override def publish(fs: FileSystem, tmp: Path, target: Path): Boolean = {
    val uuid = java.util.UUID.randomUUID().toString
    val staged = stagedPath(target, uuid)
    copy(fs, tmp, fs, staged)                      // 1. STAGE (unique name)
    val won = claims.tryClaim(target.getName, uuid) // 2. CLAIM
    if (!won) {
      try fs.delete(staged, false) catch { case scala.util.control.NonFatal(_) => () }
      repair(fs, target)                            // un-wedge a crashed winner
      return false
    }
    copy(fs, stagedPath(target, uuid), fs, target)  // 3. FILL (idempotent)
    target.getName match {
      case VersionName(v) => prune(fs, target, v.toLong)
      case _ =>
    }
    true
  }

  /** If the claim's version object is missing, its writer crashed
    * between claim and fill — finish the fill from the staged object the
    * claim names. Idempotent: every repairer writes the same bytes.
    */
  private def repair(fs: FileSystem, target: Path): Unit = {
    try {
      if (fs.exists(target)) return
      claims.readClaim(target.getName).foreach { uuid =>
        val staged = stagedPath(target, uuid)
        if (fs.exists(staged)) copy(fs, staged, fs, target)
      }
    } catch { case scala.util.control.NonFatal(_) => () } // best-effort; next rival retries
  }

  private def stagedPath(target: Path, uuid: String): Path =
    new Path(target.getParent, s".staged-$uuid.json")

  private def copy(srcFs: FileSystem, src: Path, dstFs: FileSystem, dst: Path): Unit = {
    val in = srcFs.open(src)
    try {
      val out = dstFs.create(dst, true)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally out.close()
    } finally in.close()
  }

  /** Best-effort deletion of claims + staged objects far behind the
    * committed version — keeps both stores O(retention), like snapshot
    * pruning. Staged objects are only removed once their version's
    * claim is old enough that no repair will ever need them.
    */
  private def prune(fs: FileSystem, target: Path, latest: Long): Unit = {
    val floor = latest - 2 * JsonStateStore.RetainedVersions
    if (floor <= 0) return
    try {
      val liveUuids = scala.collection.mutable.HashSet[String]()
      claims.listClaims().foreach { case (name, uuid) =>
        name match {
          case VersionName(v) if v.toLong < floor => claims.deleteClaim(name)
          case VersionName(_) => liveUuids += uuid
          case _ =>
        }
      }
      // age guard: a rival may have staged for a version it has not yet
      // claimed — deleting that object would make its later fill fail
      // and wedge the version. Only unreferenced staged objects old
      // enough that no in-flight publish can still name them go.
      val oldEnough = System.currentTimeMillis() - math.max(
        JsonStateStore.QuarantineGraceMs * 2, 10L * 60 * 1000)
      fs.listStatus(target.getParent).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(".staged-") && n.endsWith(".json")
            && st.getModificationTime < oldEnough
            && !liveUuids.contains(n.stripPrefix(".staged-").stripSuffix(".json")))
          try fs.delete(st.getPath, false) catch { case scala.util.control.NonFatal(_) => () }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}

/** The filesystem-coordinated external CAS (see [[ClaimArbitratedCAS]]
  * for the protocol): claims arbitrate through `coordDir`, a directory
  * on a store with conditional-put-capable primitives (HDFS, NFS/EFS,
  * local disk).
  */
final class CoordinatedCAS(coordDir: String)
  extends ClaimArbitratedCAS(new FsClaimStore(coordDir))
