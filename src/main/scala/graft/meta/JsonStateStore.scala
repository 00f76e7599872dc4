package graft.meta

import java.util.Base64
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.apache.spark.sql.types.DataType
import graft.core._

/** File-backed state store: the whole state serializes as one JSON
  * snapshot per version, committed by a conditional put of
  * `state-v{N}.json` (publish-if-absent = compare-and-set on N). All IO
  * goes through the Hadoop FileSystem API, so the chain can live on
  * file://, hdfs://, or any Hadoop store; the CAS primitive itself is
  * pluggable ([[StateStoreCAS]]) so an external conditional-put store —
  * the reference's DynamoDB transaction log (SURVEY.md §7.3,
  * docs/design/transaction-log-state-store.md) — slots in where the
  * filesystem can't express one.
  */
class JsonStateStore private (
    fs: FileSystem, dir: Path, cas: StateStoreCAS,
    schema0: GraftSchema, initialTree: PartitionTree, private var version: Long,
    /** table-level continual aggregation / persistent filter config —
      * table metadata in the reference; persisted so any consumer (e.g.
      * the DSv2 provider) applies the same read semantics from the path
      * alone.
      */
    val aggregationConfig: String = "",
    val filterConfig: String = "",
    val transformConfig: String = "")
    extends InMemoryStateStore(schema0, initialTree) {

  import JsonStateStore._

  override protected def commit(t: PartitionTree, r: Vector[FileReference],
      g: Vector[GCEntry], x: Map[String, Long]): Unit = {
    val next = version + 1
    // tmp name must be writer-unique: with a shared name, a concurrent
    // writer could overwrite this writer's staged content before the
    // link lands (silent wrong-content commit) or delete it from under
    // the link (NoSuchFileException) — caught by the stress test.
    val tmp = new Path(dir, s".state-v$next.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val target = new Path(dir, s"state-v$next.json")
    writeText(tmp, JsonMethods.pretty(JsonMethods.render(
      toJson(schema, t, r, g, x, aggregationConfig, filterConfig, transformConfig))))
    if (!cas.publish(fs, tmp, target)) {
      try fs.delete(tmp, false) catch { case scala.util.control.NonFatal(_) => () }
      // Lost the race: another writer committed v{next}. In-memory fields
      // were never touched (commit receives candidates as arguments), but
      // they are now stale — reload disk truth so the caller can retry.
      reloadLatest()
      // If the reload did NOT advance to v{next}, the conflicting file is
      // unreadable — a live fallback writer mid-fill or a crashed writer's
      // empty husk. Retrying immediately would lose the same CAS until the
      // quarantine grace expires (far longer than withRetry's ~20 fast
      // attempts). commit always runs INSIDE the store's monitor
      // (mutators synchronize), so the wait must not happen here — it
      // would block every reader and sibling writer for up to the grace
      // window. Tag the exception; withRetry's catch (outside the
      // monitor) does the bounded wait via onCasConflict.
      throw new ConcurrentStateException(s"lost CAS on version $next", null,
        unresolvedVersion = if (version < next) Some(next) else None)
    }
    try fs.delete(tmp, false) catch { case scala.util.control.NonFatal(_) => () }
    // per-version delta manifest: computed against the pre-commit refs
    // (still the previous version's at this point)
    val prevNames = fileReferences.map(_.filename).toSet
    version = next
    super.commit(t, r, g, x)
    writeDelta(next, r.filter(ref => !prevNames.contains(ref.filename)))
    pruneOldVersions(next)
  }

  /** Write `delta-v{N}.json` — the files ADDED at version N, the tiny
    * manifest the table-changes stream plans micro-batches from without
    * parsing full snapshots (O(changes), not O(table) per version).
    * Written only AFTER the CAS publish succeeds, so a delta can only
    * ever describe the version's true winning commit — a losing or
    * crashed writer never writes one, and a missing delta just routes
    * the stream to its snapshot-walk fallback. Best-effort by design.
    */
  private def writeDelta(v: Long, added: Vector[FileReference]): Unit = try {
    // one entry per physical file (a pre-split can reference one file
    // from several partitions; the flags agree by construction)
    val byFile = added.groupBy(_.filename).toSeq.sortBy(_._1).map(_._2.head)
    val json = JObject(
      "version" -> JInt(v),
      "added" -> JArray(byFile.map(ref => JObject(
        "filename" -> JString(ref.filename),
        "home" -> JString(ref.physicalPartitionId),
        "dataChange" -> JBool(ref.dataChange))).toList))
    val tmp = new Path(dir, s".delta-v$v.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    writeText(tmp, JsonMethods.compact(JsonMethods.render(json)))
    if (!fs.rename(tmp, new Path(dir, s"delta-v$v.json")))
      fs.delete(tmp, false)
  } catch { case scala.util.control.NonFatal(_) => () }

  private def writeText(p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
  }

  /** The grace-window wait for an unreadable rival snapshot happens here,
    * in withRetry's catch — OUTSIDE the store's monitor — so readers
    * (partitionTree/fileReferences) and sibling writers keep flowing
    * while one writer waits out a crashed fallback commit.
    */
  override protected def onCasConflict(e: ConcurrentStateException, attempt: Int): Unit =
    e.unresolvedVersion match {
      case Some(next) => awaitConflictResolution(next)
      case None => super.onCasConflict(e, attempt)
    }

  /** A version name is taken by a file that doesn't (yet) parse. Poll
    * until a live writer fills it (reload then advances past it), it is
    * quarantined away (name free again), or the quarantine grace expires —
    * after which the final reload quarantines the husk itself. Keeps a
    * writer behind a crashed fallback commit blocked for AT MOST the
    * grace window, instead of failing every retry for the same duration.
    */
  private def awaitConflictResolution(next: Long): Unit = {
    val target = new Path(dir, s"state-v$next.json")
    val deadline =
      try fs.getFileStatus(target).getModificationTime + JsonStateStore.QuarantineGraceMs + 500
      catch { case scala.util.control.NonFatal(_) => return } // already gone
    while (System.currentTimeMillis() < deadline) {
      Thread.sleep(50)
      reloadLatest()
      if (version >= next) return // conflicting commit became readable
      if (!fs.exists(target)) return // quarantined — the name is free again
    }
    reloadLatest() // past the grace: loadLatestParseable may now quarantine it
  }

  /** Retention: each commit is a full snapshot, so only recent versions
    * are needed (crash recovery + concurrent readers of the near-past).
    * Best-effort delete of versions older than the retention window
    * keeps the chain O(retention) instead of O(transaction count).
    * (The reference's transaction log compacts the same way via
    * periodic snapshots, docs/design/transaction-log-state-store.md.)
    */
  private def pruneOldVersions(latest: Long): Unit = {
    val keep = JsonStateStore.RetainedVersions
    if (latest > keep) {
      var v = latest - keep
      // walk down until a version is already gone (previous prunes)
      var missing = 0
      while (v > 0 && missing < 3) {
        val gone =
          try !fs.delete(new Path(dir, s"state-v$v.json"), false)
          catch { case scala.util.control.NonFatal(_) => true }
        try fs.delete(new Path(dir, s"delta-v$v.json"), false)
        catch { case scala.util.control.NonFatal(_) => () }
        if (gone) missing += 1
        v -= 1
      }
    }
  }

  /** Re-read the newest parseable snapshot on disk into memory. */
  def reloadLatest(): Unit = synchronized {
    val (latest, json) = loadLatestParseable(fs, dir)
    val s = fromJson(json)
    setState(s.tree, s.refs, s.gc, s.txns)
    version = latest
  }

  private[meta] def setState(t: PartitionTree, r: Vector[FileReference],
      g: Vector[GCEntry], x: Map[String, Long]): Unit = { tree = t; refs = r; gcQueue = g; txns = x }

  def currentVersion: Long = version

  private[meta] def commitInitial(): Unit = synchronized { commit(tree, refs, gcQueue, txns) }
}

/** An immutable historical snapshot of a table's state — the time-travel
  * read surface. Every query-path consumer (QueryExecutor, DSv2
  * provider, metrics) only reads, so a snapshot store drops into
  * [[graft.table.GraftTable]] unchanged; any mutation throws.
  */
final class SnapshotStateStore(
    schema0: GraftSchema, tree0: PartitionTree,
    refs0: Vector[FileReference], gc0: Vector[GCEntry], txns0: Map[String, Long],
    val version: Long,
    val aggregationConfig: String, val filterConfig: String, val transformConfig: String)
    extends InMemoryStateStore(schema0, tree0) {
  refs = refs0; gcQueue = gc0; txns = txns0

  override def readOnly: Boolean = true

  // backstop: jobs check assertWritable() before touching the
  // filesystem, but any mutation that slips through dies here too
  override protected def commit(t: PartitionTree, r: Vector[FileReference],
      g: Vector[GCEntry], x: Map[String, Long]): Unit =
    throw new UnsupportedOperationException(
      s"table snapshot at version $version is read-only (time-travel view)")
}

/** `unresolvedVersion` = the CAS was lost to a version that could not be
  * reloaded (unreadable rival — live fallback writer mid-fill or crashed
  * husk); the retry loop should wait out the conflict before retrying.
  */
class ConcurrentStateException(msg: String, cause: Throwable,
    val unresolvedVersion: Option[Long] = None) extends RuntimeException(msg, cause)

object JsonStateStore {

  /** Snapshot versions kept on disk (see pruneOldVersions). */
  val RetainedVersions = 50L

  /** Age before an unparseable snapshot may be quarantined — younger
    * ones may be a live writer's reserved-but-unfilled version.
    * Overridable (tests, fast-failover deployments) via system property.
    */
  def QuarantineGraceMs: Long =
    java.lang.Long.getLong("graft.state.quarantine.grace.ms", 60000L)

  def create(dirStr: String, schema: GraftSchema, tree: PartitionTree,
      aggregationConfig: String = "", filterConfig: String = "",
      transformConfig: String = "", cas: Option[StateStoreCAS] = None): JsonStateStore = {
    val (fs, dir) = GraftFS.resolve(dirStr)
    fs.mkdirs(dir)
    val store = new JsonStateStore(fs, dir, cas.getOrElse(GraftFS.casFor(fs)),
      schema, tree, 0L, aggregationConfig, filterConfig, transformConfig)
    store.commitInitial() // writes state-v1.json
    store
  }

  def load(dirStr: String, cas: Option[StateStoreCAS] = None): JsonStateStore = {
    val (fs, dir) = GraftFS.resolve(dirStr)
    val (latest, json) = loadLatestParseable(fs, dir)
    val s = fromJson(json)
    val (agg, filt, tf) = configFromJson(json)
    val store = new JsonStateStore(fs, dir, cas.getOrElse(GraftFS.casFor(fs)),
      s.schema, s.tree, latest, agg, filt, tf)
    store.setState(s.tree, s.refs, s.gc, s.txns)
    store
  }

  /** Newest committed version number from the directory listing alone —
    * no snapshot content is read or parsed. The cheap poll for offset
    * discovery (the table-changes stream calls this every trigger).
    */
  def latestVersionIn(dirStr: String): Option[Long] = {
    val (fs, dir) = GraftFS.resolve(dirStr)
    latestVersion(fs, dir)
  }

  /** The files added at `version`, from its delta manifest:
    * (filename, home partition dir, dataChange). `None` when the
    * manifest is absent or unreadable — history from before deltas
    * existed, a writer that crashed between snapshot and delta, or a
    * torn write — in which case callers fall back to diffing the
    * consecutive snapshots (which the manifest merely memoizes).
    */
  def deltaAddedAt(dirStr: String, version: Long): Option[Seq[(String, String, Boolean)]] = {
    val (fs, dir) = GraftFS.resolve(dirStr)
    val p = new Path(dir, s"delta-v$version.json")
    try {
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      JsonMethods.parse(text) match {
        case o: JObject =>
          val m = o.obj.toMap
          val declared = m.get("version").collect { case JInt(n) => n.toLong }
          if (!declared.contains(version)) return None
          m.get("added").collect { case JArray(items) =>
            items.map { item =>
              val f = item.asInstanceOf[JObject].obj.toMap
              def str(k: String) = f(k).asInstanceOf[JString].s
              val dc = f.get("dataChange").collect { case JBool(b) => b }.getOrElse(true)
              (str("filename"), str("home"), dc)
            }
          }
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Time travel: the state EXACTLY as of a historical version. Valid
    * within the retention bounds — the version chain keeps the last
    * [[RetainedVersions]] snapshots, and GC physically deletes a file
    * only after it has been unreferenced for the table's GC delay — the
    * same bounded-history contract as the reference's transaction-log
    * snapshots (docs/design/transaction-log-state-store.md) and Delta
    * time travel. Reads work; mutations throw.
    */
  def loadAt(dirStr: String, version: Long): SnapshotStateStore = {
    val (fs, dir) = GraftFS.resolve(dirStr)
    val p = new Path(dir, s"state-v$version.json")
    val json =
      try {
        val in = fs.open(p)
        try JsonMethods.parse(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
      } catch {
        case scala.util.control.NonFatal(e) =>
          throw new IllegalStateException(
            s"state version $version unavailable in $dirStr (pruned after " +
              s"$RetainedVersions newer commits, or never committed)", e)
      }
    val s = fromJson(json)
    val (agg, filt, tf) = configFromJson(json)
    new SnapshotStateStore(s.schema, s.tree, s.refs, s.gc, s.txns, version, agg, filt, tf)
  }

  /** Newest snapshot that parses. A crash in the non-hard-link commit
    * fallback (version reserved O_EXCL, then filled by a move) can leave
    * a permanently empty/truncated latest snapshot; selecting it forever
    * would brick the table, so readers fall back past unparseable
    * versions — every snapshot is a FULL state copy, so falling back one
    * version only loses the single interrupted transaction, which its
    * writer never saw succeed.
    *
    * Quarantine (rename to `.corrupt`) is deliberately conservative and
    * only applies to content that was READ successfully but fails to
    * parse. Non-empty garbage is quarantined immediately (the fallback
    * fills a reservation with one atomic move, so partial content never
    * legitimately exists). An EMPTY file gets a grace window first: it
    * may be a LIVE fallback writer's just-reserved version — renaming it
    * away would free the version name for a rival and let the first
    * writer's later move silently clobber the rival's committed snapshot
    * (the exact lost-update the create-exclusive CAS exists to prevent).
    * An IO error never quarantines: the content is unknown, and a
    * transient failure (NFS hiccup, permissions) must not destroy the
    * latest committed state.
    */
  private def loadLatestParseable(fs: FileSystem, dir: Path): (Long, JValue) = {
    val latest = latestVersion(fs, dir).getOrElse(
      throw new IllegalStateException(s"no state snapshot in $dir"))
    var v = latest
    val floor = math.max(1L, latest - RetainedVersions) // older versions are pruned anyway
    while (v >= floor) {
      val p = new Path(dir, s"state-v$v.json")
      val content: Option[String] =
        try {
          if (!fs.exists(p)) None
          else {
            val in = fs.open(p)
            try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
            finally in.close()
          }
        }
        catch { case scala.util.control.NonFatal(_) => None } // IO error: fall back, never rename
      content.foreach { text =>
        try return (v, JsonMethods.parse(text))
        catch {
          case scala.util.control.NonFatal(_) =>
            val stale =
              try fs.getFileStatus(p).getModificationTime <
                System.currentTimeMillis() - QuarantineGraceMs
              catch { case scala.util.control.NonFatal(_) => false }
            if (text.nonEmpty || stale) {
              try {
                val corrupt = new Path(dir, s"state-v$v.json.corrupt")
                try fs.delete(corrupt, false) catch { case scala.util.control.NonFatal(_) => () }
                // rename returning false (destination re-created concurrently,
                // HDFS-style semantics) would leave the unparseable snapshot in
                // place, re-read and re-quarantined on every load — the content
                // is proven unreadable and past grace, so deleting it loses
                // only a transaction its writer never saw succeed.
                if (!fs.rename(p, corrupt)) fs.delete(p, false)
              }
              catch { case scala.util.control.NonFatal(_) => () }
            }
        }
      }
      v -= 1
    }
    throw new IllegalStateException(s"no parseable state snapshot in $dir")
  }

  private def latestVersion(fs: FileSystem, dir: Path): Option[Long] = {
    val re = "state-v(\\d+)\\.json".r
    if (!fs.exists(dir)) return None
    var best: Option[Long] = None
    fs.listStatus(dir).foreach { st =>
      st.getPath.getName match {
        case re(n) => if (best.forall(_ < n.toLong)) best = Some(n.toLong)
        case _ =>
      }
    }
    best
  }

  // ---- JSON codec (key values are tagged so Int/Long/String/bytes round-trip) ----

  private def keyToJson(v: Any): JValue = v match {
    case i: Int => JObject("t" -> JString("int"), "v" -> JInt(i))
    case l: Long => JObject("t" -> JString("long"), "v" -> JInt(l))
    case s: String => JObject("t" -> JString("string"), "v" -> JString(s))
    case b: Array[Byte] =>
      JObject("t" -> JString("bytes"), "v" -> JString(Base64.getEncoder.encodeToString(b)))
    case null => JNull
    case other => throw new IllegalArgumentException(s"unsupported key value ${other.getClass}")
  }

  private def keyFromJson(j: JValue): Any = j match {
    case JNull => null
    case JObject(fields) =>
      val m = fields.toMap
      val JString(t) = m("t"): @unchecked
      (t, m("v")) match {
        case ("int", JInt(i)) => i.toInt
        case ("long", JInt(i)) => i.toLong
        case ("string", JString(s)) => s
        case ("bytes", JString(s)) => Base64.getDecoder.decode(s)
        case other => throw new IllegalArgumentException(s"bad key json: $other")
      }
    case other => throw new IllegalArgumentException(s"bad key json: $other")
  }

  private def optKeyToJson(v: Option[Any]): JValue = v.map(keyToJson).getOrElse(JNothing)

  private def rangeToJson(r: KeyRange): JValue = JObject(
    "field" -> JString(r.field),
    "min" -> optKeyToJson(r.min), "minInclusive" -> JBool(r.minInclusive),
    "max" -> optKeyToJson(r.max), "maxInclusive" -> JBool(r.maxInclusive))

  private def rangeFromJson(j: JValue): KeyRange = {
    val m = j.asInstanceOf[JObject].obj.toMap
    def opt(k: String): Option[Any] = m.get(k).filter(_ != JNothing).filter(_ != JNull).map(keyFromJson)
    val JString(f) = m("field"): @unchecked
    val JBool(mi) = m("minInclusive"): @unchecked
    val JBool(ma) = m("maxInclusive"): @unchecked
    KeyRange(f, opt("min"), mi, opt("max"), ma)
  }

  private def partitionToJson(p: Partition): JValue = JObject(
    "id" -> JString(p.id),
    "region" -> JArray(p.region.ranges.map(rangeToJson).toList),
    "parent" -> p.parentId.map(JString(_)).getOrElse(JNothing),
    "children" -> JArray(p.childIds.map(JString(_)).toList),
    "splitDimension" -> p.splitDimension.map(d => JInt(d)).getOrElse(JNothing),
    "splitPoint" -> optKeyToJson(p.splitPoint))

  private def partitionFromJson(j: JValue): Partition = {
    val m = j.asInstanceOf[JObject].obj.toMap
    val JString(id) = m("id"): @unchecked
    val JArray(rs) = m("region"): @unchecked
    val parent = m.get("parent").collect { case JString(s) => s }
    val JArray(cs) = m("children"): @unchecked
    val dim = m.get("splitDimension").collect { case JInt(i) => i.toInt }
    val sp = m.get("splitPoint").filter(v => v != JNothing && v != JNull).map(keyFromJson)
    Partition(id, Region(rs.map(rangeFromJson)), parent,
      cs.map { case JString(s) => s; case o => sys.error(s"bad child $o") }, dim, sp)
  }

  private def fieldToJson(f: GraftField): JValue = JObject(
    "name" -> JString(f.name), "type" -> JString(f.dataType.json), "nullable" -> JBool(f.nullable))

  private def fieldFromJson(j: JValue): GraftField = {
    val m = j.asInstanceOf[JObject].obj.toMap
    val JString(n) = m("name"): @unchecked
    val JString(t) = m("type"): @unchecked
    val JBool(nl) = m("nullable"): @unchecked
    GraftField(n, DataType.fromJson(t), nl)
  }

  private def refToJson(r: FileReference): JValue = JObject(
    "filename" -> JString(r.filename), "partitionId" -> JString(r.partitionId),
    "rowCount" -> JInt(r.rowCount), "jobId" -> r.jobId.map(JString(_)).getOrElse(JNothing),
    "homeId" -> r.homeId.map(JString(_)).getOrElse(JNothing),
    "dataChange" -> JBool(r.dataChange))

  private def refFromJson(j: JValue): FileReference = {
    val m = j.asInstanceOf[JObject].obj.toMap
    val JString(f) = m("filename"): @unchecked
    val JString(p) = m("partitionId"): @unchecked
    val JInt(c) = m("rowCount"): @unchecked
    FileReference(f, p, c.toLong, m.get("jobId").collect { case JString(s) => s },
      m.get("homeId").collect { case JString(s) => s },
      // absent in pre-round-6 snapshots (migration): conservatively true —
      // a stream starting from such history may re-emit compacted rows,
      // but never silently drops ingested ones
      m.get("dataChange").collect { case JBool(b) => b }.getOrElse(true))
  }

  private def configFromJson(j: JValue): (String, String, String) = {
    val m = j.asInstanceOf[JObject].obj.toMap
    m.get("tableConfig") match {
      case Some(JObject(fields)) =>
        val cm = fields.toMap
        def str(k: String) = cm.get(k).collect { case JString(s) => s }.getOrElse("")
        (str("aggregation"), str("filter"), str("transform"))
      case _ => ("", "", "")
    }
  }

  private def toJson(schema: GraftSchema, tree: PartitionTree,
      refs: Vector[FileReference], gc: Vector[GCEntry], txns: Map[String, Long],
      aggregationConfig: String, filterConfig: String, transformConfig: String): JValue = JObject(
    "tableConfig" -> JObject(
      "aggregation" -> JString(aggregationConfig), "filter" -> JString(filterConfig),
      "transform" -> JString(transformConfig)),
    "schema" -> JObject(
      "rowKeys" -> JArray(schema.rowKeys.map(fieldToJson).toList),
      "sortKeys" -> JArray(schema.sortKeys.map(fieldToJson).toList),
      "values" -> JArray(schema.values.map(fieldToJson).toList)),
    "partitions" -> JArray(tree.partitions.map(partitionToJson).toList),
    "files" -> JArray(refs.map(refToJson).toList),
    "gc" -> JArray(gc.map { e =>
      JObject("filename" -> JString(e.filename), "sinceMs" -> JInt(e.sinceMs),
        "homeId" -> e.homeId.map(JString(_)).getOrElse(JNothing)) }.toList),
    "txns" -> JObject(txns.toList.sortBy(_._1).map { case (app, v) => app -> JInt(v) }))

  private final case class Snapshot(schema: GraftSchema, tree: PartitionTree,
      refs: Vector[FileReference], gc: Vector[GCEntry], txns: Map[String, Long])

  private def fromJson(j: JValue): Snapshot = {
    val m = j.asInstanceOf[JObject].obj.toMap
    val sm = m("schema").asInstanceOf[JObject].obj.toMap
    def fields(k: String): Seq[GraftField] =
      sm(k).asInstanceOf[JArray].arr.map(fieldFromJson)
    val schema = GraftSchema(fields("rowKeys"), fields("sortKeys"), fields("values"))
    val JArray(ps) = m("partitions"): @unchecked
    val tree = PartitionTree(schema, ps.map(partitionFromJson))
    val JArray(fs) = m("files"): @unchecked
    val JArray(gs) = m("gc"): @unchecked
    val gc = gs.map { g =>
      val gm = g.asInstanceOf[JObject].obj.toMap
      val JString(f) = gm("filename"): @unchecked
      val JInt(t) = gm("sinceMs"): @unchecked
      GCEntry(f, t.toLong, gm.get("homeId").collect { case JString(s) => s })
    }
    // "txns" absent in pre-round-4 snapshots (migration)
    val txns = m.get("txns").collect {
      case JObject(fields) => fields.collect { case (app, JInt(v)) => app -> v.toLong }.toMap
    }.getOrElse(Map.empty[String, Long])
    Snapshot(schema, tree, fs.map(refFromJson).toVector, gc.toVector, txns)
  }
}
