package graft.meta

import graft.core.PartitionTree

/** The table's persisted, versioned configuration — aggregation /
  * filter / transform / index strings (the reference's table
  * properties). Part of [[TableState]] so property edits version
  * through the log, replay, snapshots and time travel exactly like
  * schema evolution.
  */
final case class TableProps(
    aggregation: String = "",
    filter: String = "",
    transform: String = "",
    index: String = "") {
  def get(key: String): String = key match {
    case "aggregation" => aggregation
    case "filter" => filter
    case "transform" => transform
    case "index" => index
    case other => throw new IllegalArgumentException(s"unknown table property '$other'")
  }
  def set(key: String, value: String): TableProps = key match {
    case "aggregation" => copy(aggregation = value)
    case "filter" => copy(filter = value)
    case "transform" => copy(transform = value)
    case "index" => copy(index = value)
    case other => throw new IllegalArgumentException(s"unknown table property '$other'")
  }
}

/** The table's complete metadata state as one immutable value — what a
  * [[StateTransaction]] maps to the next version.
  */
final case class TableState(
    tree: PartitionTree,
    refs: Vector[FileReference],
    gc: Vector[GCEntry],
    txns: Map[String, Long],
    /** pending row-key tombstones (sorted key-only files, one per leaf):
      * rows with these row keys are suppressed by every reader until a
      * compaction physically purges them and retires the tombstone (see
      * [[StateTransaction.AddTombstones]]).
      */
    tombstones: Vector[FileReference] = Vector.empty,
    /** persisted table configuration, versioned with everything else */
    props: TableProps = TableProps())

/** One state-store commit as a small, replayable CHANGE description —
  * the reference's transaction-log model (reference:
  * java/core/.../statestore/transactionlog/transaction/impl/ *Transaction.java,
  * docs/design/transaction-log-state-store.md): the durable log appends
  * an O(changes) entry per commit instead of an O(table) snapshot, and
  * periodic snapshots bound replay.
  *
  * `applyTo` is PURE and DETERMINISTIC given the prior state — the same
  * function serves the live mutator (compute the candidate next state)
  * and log replay (reconstruct any version from the nearest snapshot).
  * Preconditions live here too, so a conflicting-by-content transaction
  * fails identically on first run and on a lost-CAS retry.
  */
sealed trait StateTransaction {
  def applyTo(s: TableState): TableState
}

object StateTransaction {

  /** Table creation (version 1). Never appended to the log — version 1
    * is always a full snapshot (it must carry the schema and table
    * config) — so applyTo is identity over the initial state.
    */
  case object Init extends StateTransaction {
    override def applyTo(s: TableState): TableState = s
  }

  /** Next write-generation sequence for a commit: one past the maximum
    * over LIVE refs and pending tombstones. Tombstones count so that a
    * data generation is never stamped equal to a pending delete marker
    * in a sibling leaf (file.seq <= tombstone.seq would wrongly suppress
    * the brand-new rows).
    */
  private[meta] def nextSeq(s: TableState): Long = {
    val m0 = s.refs.foldLeft(0L)((m, r) => math.max(m, r.seq))
    s.tombstones.foldLeft(m0)((m, r) => math.max(m, r.seq)) + 1
  }

  /** AddFilesTransaction — new files from ingest / bulk import.
    * `watermark` carries the Delta-style idempotent-txn version for
    * streaming appends ([[StateStore.addFilesIfAbsent]]); the watermark
    * lands in the SAME atomic commit as the refs.
    */
  final case class AddFiles(newRefs: Vector[FileReference],
      watermark: Option[(String, Long)] = None) extends StateTransaction {
    override def applyTo(s: TableState): TableState = {
      newRefs.foreach { r =>
        require(s.tree.partitions.exists(_.id == r.partitionId),
          s"unknown partition ${r.partitionId}")
        require(!s.refs.exists(e => e.filename == r.filename && e.partitionId == r.partitionId),
          s"${r.filename} already referenced in ${r.partitionId}")
      }
      // Stamp the write-generation sequence: one commit = one generation
      // (deterministic on replay — derived purely from the prior state).
      // max(live seqs)+1 stays correct through compaction because a
      // ReplaceFiles output carries max(inputs): the leaf-local maximum
      // can never regress while any row of that generation is live.
      val nextSeq = StateTransaction.nextSeq(s)
      val stamped = newRefs.map(r => if (r.seq == 0L) r.copy(seq = nextSeq) else r)
      s.copy(refs = s.refs ++ stamped,
        txns = watermark.fold(s.txns) { case (app, v) => s.txns + (app -> v) })
    }
  }

  /** ReplaceFileReferencesTransaction — compaction commit: atomically
    * drop the input refs in one partition and add the single output ref
    * (`output = None` is the pure-removal variant: a filter dropped
    * every row). Inputs orphaned everywhere move to the GC queue with
    * `nowMs` recorded IN the transaction, so replay reconstructs the
    * identical GC eligibility times.
    */
  final case class ReplaceFiles(partitionId: String, inputs: Vector[String],
      output: Option[FileReference], nowMs: Long,
      /** tombstone files this compaction PHYSICALLY APPLIED (their keys
        * are absent from the output): retired to the GC queue in the
        * same atomic commit, so readers never double-apply them.
        */
      consumedTombstones: Vector[String] = Vector.empty) extends StateTransaction {
    override def applyTo(s: TableState): TableState = {
      output.foreach(o => require(o.partitionId == partitionId,
        "output must belong to the compacted partition"))
      inputs.foreach { f =>
        require(s.refs.exists(r => r.filename == f && r.partitionId == partitionId),
          s"input $f not referenced in $partitionId")
      }
      consumedTombstones.foreach { f =>
        require(s.tombstones.exists(t => t.filename == f && t.partitionId == partitionId),
          s"tombstone $f not pending in $partitionId")
      }
      // capture each orphaned file's physical home BEFORE dropping its
      // refs, so GC later deletes by direct path (no directory scan)
      val homes: Map[String, String] = s.refs.filter(r => inputs.contains(r.filename))
        .map(r => r.filename -> r.physicalPartitionId).toMap
      val remaining =
        s.refs.filterNot(r => r.partitionId == partitionId && inputs.contains(r.filename))
      val orphaned = inputs.filterNot(f => remaining.exists(_.filename == f))
      val tombHomes: Map[String, String] = s.tombstones
        .filter(t => consumedTombstones.contains(t.filename))
        .map(t => t.filename -> t.physicalPartitionId).toMap
      // a compaction output rearranges rows the log already carries —
      // dataChange=false keeps the table-changes stream from re-emitting
      s.copy(
        refs = remaining ++ output.map(_.copy(dataChange = false)),
        tombstones = s.tombstones.filterNot(t =>
          t.partitionId == partitionId && consumedTombstones.contains(t.filename)),
        gc = s.gc ++ orphaned.map(f => GCEntry(f, nowMs, homes.get(f))) ++
          consumedTombstones.map(f => GCEntry(f, nowMs, tombHomes.get(f))))
    }
  }

  /** SplitPartitionTransaction — split a leaf at a point (metadata only). */
  final case class SplitPartition(parentId: String, dimension: Int, splitPoint: Any,
      leftId: String, rightId: String) extends StateTransaction {
    override def applyTo(s: TableState): TableState =
      s.copy(tree = s.tree.addSplit(parentId, dimension, splitPoint, leftId, rightId))
  }

  /** SplitFileReferences (M4) — push refs on non-leaf partitions down one
    * level: each parent ref becomes one ref per child with halved
    * row-count estimates. Deterministic given the prior state (ref order
    * and child order are both part of the state).
    */
  case object SplitFileRefs extends StateTransaction {
    override def applyTo(s: TableState): TableState = {
      val nonLeaf = s.refs.filter(r => !s.tree(r.partitionId).isLeaf)
      var next = s.refs
      nonLeaf.foreach { r =>
        val children = s.tree(r.partitionId).childIds.map(s.tree(_))
        val half = math.max(r.rowCount / 2, 1)
        next = next.filterNot(_ == r) ++ children.map(c =>
          FileReference(r.filename, c.id, half, r.jobId, Some(r.physicalPartitionId),
            r.dataChange, r.seq))
      }
      // tombstones parked on a split parent move down the same way, so
      // each child's compaction can consume ITS entry (the shared
      // physical file is GC'd once; a second GC entry for the same name
      // is a tolerated no-op delete)
      var tombs = s.tombstones
      s.tombstones.filter(t => !s.tree(t.partitionId).isLeaf).foreach { t =>
        val children = s.tree(t.partitionId).childIds.map(s.tree(_))
        val half = math.max(t.rowCount / 2, 1)
        tombs = tombs.filterNot(_ == t) ++ children.map(c =>
          FileReference(t.filename, c.id, half, t.jobId, Some(t.physicalPartitionId),
            t.dataChange, t.seq))
      }
      s.copy(refs = next, tombstones = tombs)
    }
  }

  /** Compaction job assignment — guards double-compaction. */
  final case class AssignJob(jobId: String, partitionId: String,
      filenames: Vector[String]) extends StateTransaction {
    override def applyTo(s: TableState): TableState = {
      filenames.foreach { f =>
        val r = s.refs.find(r => r.filename == f && r.partitionId == partitionId)
          .getOrElse(throw new IllegalArgumentException(s"$f not referenced in $partitionId"))
        require(r.jobId.isEmpty, s"$f already assigned to job ${r.jobId.get}")
      }
      s.copy(refs = s.refs.map { r =>
        if (filenames.contains(r.filename) && r.partitionId == partitionId)
          r.copy(jobId = Some(jobId))
        else r
      })
    }
  }

  /** Drop GC-queue entries after physical deletion. */
  final case class RemoveGCFiles(filenames: Vector[String]) extends StateTransaction {
    override def applyTo(s: TableState): TableState =
      s.copy(gc = s.gc.filterNot(e => filenames.contains(e.filename)))
  }

  /** AddTombstonesTransaction — row-key deletes: each ref is a SORTED
    * key-only parquet file scoped to one leaf; readers suppress any row
    * whose row key appears in a pending tombstone of its leaf (a
    * streaming merge-anti-join — both sides are key-sorted, O(1)
    * memory), and compaction physically purges the keys then retires
    * the tombstone atomically (ReplaceFiles.consumedTombstones). The
    * takedown-request capability the reference lacks entirely (its only
    * removal is ageOff). GENERATION-AWARE (LSM delete-marker) semantics:
    * the tombstone is stamped with the commit's write-generation seq and
    * suppresses its key only in files of OLDER generations (file.seq <=
    * tombstone.seq) — a re-ingest of a deleted key lands in a newer
    * generation and survives, exactly like a put shadowing a delete
    * marker in an LSM tree. Legacy seq=0 files are suppressed by every
    * tombstone (they predate generation tracking).
    */
  final case class AddTombstones(refs: Vector[FileReference]) extends StateTransaction {
    override def applyTo(s: TableState): TableState = {
      refs.foreach { r =>
        require(s.tree.partitions.exists(p => p.id == r.partitionId && p.isLeaf),
          s"tombstone partition ${r.partitionId} is not a leaf")
        require(!s.tombstones.exists(t => t.filename == r.filename),
          s"tombstone ${r.filename} already pending")
      }
      // one deleteKeys commit = one generation, shared by its per-leaf
      // files; deterministic on replay (derived purely from prior state)
      val seq = StateTransaction.nextSeq(s)
      s.copy(tombstones = s.tombstones ++ refs.map(r =>
        if (r.seq == 0L) r.copy(seq = seq) else r))
    }
  }

  /** MergeTransaction — MERGE INTO commit: new data files and row-key
    * delete markers land in ONE atomic version. Composition of the two
    * building blocks, which also fixes the generation order: the
    * tombstones stamp first (generation N) and the data files after
    * (N+1, because pending tombstones count into nextSeq) — so a source
    * that both deletes and puts a key resolves to the put, and a reader
    * can never observe the merge's deletes without its puts or vice
    * versa. (Delta/Iceberg MERGE INTO atomicity, expressed over the
    * LSM delete-marker machinery instead of file rewrites.)
    */
  final case class Merge(adds: Vector[FileReference],
      tombs: Vector[FileReference],
      /** Delta-style idempotent-txn watermark (streaming CDC apply):
        * lands in the same atomic commit, exactly as AddFiles.watermark.
        */
      watermark: Option[(String, Long)] = None) extends StateTransaction {
    override def applyTo(s: TableState): TableState =
      AddFiles(adds, watermark).applyTo(AddTombstones(tombs).applyTo(s))
  }

  /** Truncate — drop EVERY live file reference and pending tombstone to
    * the GC queue in one O(1) metadata version (SQL TRUNCATE TABLE, and
    * the clearing half of atomic INSERT OVERWRITE via
    * [[StateStore.overwriteFiles]]). Data files are not touched here:
    * pre-truncate versions stay time-travel-readable until GC collects
    * the orphans after the configured delay — the same contract as
    * compaction orphans. `nowMs` rides IN the transaction so replay
    * reconstructs identical GC eligibility times.
    */
  final case class Truncate(nowMs: Long) extends StateTransaction {
    override def applyTo(s: TableState): TableState = {
      val orphans = s.refs.map(r => r.filename -> r.physicalPartitionId).distinct
        .map { case (f, home) => GCEntry(f, nowMs, Some(home)) }
      val tombOrphans = s.tombstones.map(t => t.filename -> t.physicalPartitionId)
        .distinct.map { case (f, home) => GCEntry(f, nowMs, Some(home)) }
      s.copy(refs = Vector.empty, tombstones = Vector.empty,
        gc = s.gc ++ orphans ++ tombOrphans)
    }
  }

  /** Restore — roll the table's DATA back to a historical version's
    * contents (Delta RESTORE): the target refs and pending tombstones
    * ride INLINE in the transaction (replay must not depend on reading
    * history), files visible now but absent from the target move to
    * the GC queue, and target files still pending in the GC queue are
    * resurrected. The mutator ([[graft.table.GraftTable.restoreTo]])
    * verifies every target file still physically exists BEFORE
    * committing — a target older than GC retention is refused there
    * (filesystem checks cannot live in applyTo). The partition tree,
    * schema and properties stay CURRENT (the tree only ever gains
    * splits, so historical partition ids remain valid; restored files
    * on now-split parents push down like any pre-split ref). Change
    * feeds DELIVER a restore as a reset diff (retract rolled-back keys,
    * re-assert the restored state above them) — see
    * graft.table.ChangeFeed.restoreEvents — so subscribers converge to
    * the restored table instead of silently diverging.
    */
  final case class Restore(refs: Vector[FileReference],
      tombstones: Vector[FileReference], nowMs: Long) extends StateTransaction {
    override def applyTo(s: TableState): TableState = {
      (refs ++ tombstones).foreach { r =>
        require(s.tree.partitions.exists(_.id == r.partitionId),
          s"restored reference ${r.filename} names unknown partition ${r.partitionId}")
      }
      val keep = (refs ++ tombstones).map(_.filename).toSet
      val dropped = (s.refs ++ s.tombstones)
        .filterNot(r => keep(r.filename))
        .map(r => r.filename -> r.physicalPartitionId).distinct
        .map { case (f, home) => GCEntry(f, nowMs, Some(home)) }
      s.copy(refs = refs, tombstones = tombstones,
        gc = s.gc.filterNot(e => keep(e.filename)) ++ dropped)
    }
  }

  /** SetProperties — versioned edits to the persisted table config (the
    * reference's admin-console property editor, reference:
    * java/clients/src/main/java/sleeper/clients/admin/properties/UpdatePropertiesWithTextEditor.java
    * + docs/usage/properties — there an interactive editor writing
    * validated table properties; here ONE O(1) transaction, so property
    * changes version through the log, replay, snapshots and time
    * travel). Validation is deterministic on the prior state, so a
    * replayed edit re-validates identically:
    *  - `filter` / `index` parse against the CURRENT schema and apply
    *    forward (reads, compactions and new writes see them; existing
    *    files are unaffected — a file without a bloom sidecar simply
    *    never skips);
    *  - `aggregation` may only change while the table holds NO data and
    *    NO pending tombstones: existing files were written under the old
    *    semantics, and re-aggregating them retroactively would change
    *    committed reads;
    *  - `transform` is set as an opaque string here (class resolution
    *    needs deployment-level jars, which replay cannot see) — callers
    *    validate loadability mutator-side.
    */
  final case class SetProperties(updates: Map[String, String]) extends StateTransaction {
    require(updates.nonEmpty, "empty property update")
    override def applyTo(s: TableState): TableState = {
      val schema = s.tree.schema
      var props = s.props
      updates.foreach { case (k, v) =>
        k match {
          case "aggregation" =>
            require(s.refs.isEmpty && s.tombstones.isEmpty,
              "aggregation config may only change while the table is empty " +
                s"(${s.refs.size} live files, ${s.tombstones.size} pending tombstones): " +
                "existing files were written under the old semantics")
            graft.dsl.ConfigDsl.parseAggregation(v, schema) // validates
          case "filter" =>
            graft.dsl.ConfigDsl.parseFilter(v, schema) // validates
          case "index" =>
            BloomIndex.validate(schema, v)
          case "transform" => // opaque (jars are deployment-level)
          case other =>
            throw new IllegalArgumentException(
              s"unknown table property '$other' (expected aggregation/filter/transform/index)")
        }
        props = props.set(k, v)
      }
      s.copy(props = props)
    }
  }

  /** Batch — N independent commits folded into ONE log version (the
    * reference's batched async state-store committer, reference:
    * java/statestore-committer-core/src/main/java/sleeper/statestore/committer/StateStoreCommitter.java:
    * high commit rates are amortized by applying many queued commits
    * per round-trip to the durable log). `applyTo` folds the children
    * in submission order over the evolving state, so (a) every child's
    * preconditions are checked against its true predecessor — a child
    * conflicting with an earlier sibling fails exactly as it would have
    * serially — and (b) generation stamping stays correct: each
    * seq-stamping child (AddFiles/AddTombstones/Merge) draws nextSeq
    * from the state its predecessors produced, so within-version commit
    * order is preserved in the refs' seqs. Children are validated
    * individually BEFORE batching ([[InMemoryStateStore.commitValidated]]);
    * the composite itself therefore never fails on replay.
    */
  final case class Batch(txns: Vector[StateTransaction]) extends StateTransaction {
    require(txns.nonEmpty, "empty commit batch")
    require(!txns.exists(t => t.isInstanceOf[Batch] || t == Init),
      "a batch carries only simple transactions")
    // the change feed plans a restore version as a reset diff from the
    // version's manifest marker, which a composite version cannot carry
    require(!txns.exists(_.isInstanceOf[Restore]),
      "RESTORE commits its own version (change-feed reset semantics)")
    override def applyTo(s: TableState): TableState =
      txns.foldLeft(s)((st, t) => t.applyTo(st))
  }

  /** AddColumnTransaction — schema evolution: append one NULLABLE value
    * column (the table schema rides in the partition tree, so this is an
    * O(1) metadata change). Files written before the change simply lack
    * the column; every reader fills it with nulls, and compaction
    * converges files to the widened schema as it rewrites them. Append-
    * only by design: keys, sort order and existing columns never change,
    * so file sort order, split points, and sketches all stay valid —
    * the widening the reference's fixed-schema tables cannot do.
    */
  final case class AddColumn(field: graft.core.GraftField) extends StateTransaction {
    override def applyTo(s: TableState): TableState = {
      val sch = s.tree.schema
      require(!sch.allFields.exists(_.name == field.name),
        s"column ${field.name} already exists")
      // an alias or retired name is a PHYSICAL column still present in
      // old files — a new logical column under it would read their
      // stale bytes as its own values
      require(!(sch.allFields.flatMap(_.aliases) ++ sch.retired).contains(field.name),
        s"column name ${field.name} was previously used (renamed or dropped); " +
          "old data files still carry it — pick a fresh name")
      require(field.nullable,
        s"added column ${field.name} must be nullable (existing files have no values for it)")
      s.copy(tree = s.tree.copy(schema = sch.copy(values = sch.values :+ field)))
    }
  }

  /** Guard shared by rename/drop: the table's persistent configs
    * (aggregation/filter/transform/index) address columns by name; a
    * mapping-only rename/drop under them would silently change read
    * semantics. Word-boundary match keeps the check config-syntax-
    * agnostic (configs are comma/paren-separated identifier lists).
    */
  private def requireUnreferenced(s: TableState, col: String, op: String): Unit = {
    val p = s.props
    val re = ("(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(col) +
      "(?![A-Za-z0-9_])").r
    Seq("aggregation" -> p.aggregation, "filter" -> p.filter,
      "transform" -> p.transform, "index" -> p.index).foreach { case (k, cfg) =>
      require(re.findFirstIn(cfg).isEmpty,
        s"cannot $op column $col: referenced by the table's $k config ($cfg)")
    }
  }

  /** RENAME COLUMN (value fields only) — pure metadata, no data rewrite:
    * the old name becomes an ALIAS resolved at the parquet read boundary
    * ([[graft.core.GraftField.aliases]]). Keys are immutable (sort
    * order, split points and sketches depend on them).
    */
  final case class RenameColumn(from: String, to: String) extends StateTransaction {
    override def applyTo(s: TableState): TableState = {
      val sch = s.tree.schema
      val i = sch.values.indexWhere(_.name == from)
      require(i >= 0,
        if (sch.keyFields.exists(_.name == from))
          s"cannot rename key column $from (sort order, split points and sketches depend on it)"
        else s"no such value column: $from")
      require(!(sch.allFields.flatMap(_.readNames) ++ sch.retired).contains(to),
        s"column name $to is already in use (as a name, alias, or retired name)")
      requireUnreferenced(s, from, "rename")
      val f = sch.values(i)
      val renamed = f.copy(name = to, aliases = from +: f.aliases)
      s.copy(tree = s.tree.copy(schema =
        sch.copy(values = sch.values.updated(i, renamed))))
    }
  }

  /** DROP COLUMN (value fields only) — pure metadata: the field leaves
    * the live schema; old files keep its bytes, readable via time
    * travel (historical snapshots carry the historical schema). Its
    * name and aliases are RETIRED so AddColumn can never resurrect
    * stale bytes under a reused name.
    */
  final case class DropColumn(name: String) extends StateTransaction {
    override def applyTo(s: TableState): TableState = {
      val sch = s.tree.schema
      val i = sch.values.indexWhere(_.name == name)
      require(i >= 0,
        if (sch.keyFields.exists(_.name == name))
          s"cannot drop key column $name"
        else s"no such value column: $name")
      requireUnreferenced(s, name, "drop")
      val f = sch.values(i)
      s.copy(tree = s.tree.copy(schema = sch.copy(
        values = sch.values.patch(i, Nil, 1),
        retired = sch.retired ++ f.readNames)))
    }
  }
}
