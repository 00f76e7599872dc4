package graft.meta

import graft.core.PartitionTree

/** The table's complete metadata state as one immutable value — what a
  * [[StateTransaction]] maps to the next version.
  */
final case class TableState(
    tree: PartitionTree,
    refs: Vector[FileReference],
    gc: Vector[GCEntry],
    txns: Map[String, Long])

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
      s.copy(refs = s.refs ++ newRefs,
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
      output: Option[FileReference], nowMs: Long) extends StateTransaction {
    override def applyTo(s: TableState): TableState = {
      output.foreach(o => require(o.partitionId == partitionId,
        "output must belong to the compacted partition"))
      inputs.foreach { f =>
        require(s.refs.exists(r => r.filename == f && r.partitionId == partitionId),
          s"input $f not referenced in $partitionId")
      }
      // capture each orphaned file's physical home BEFORE dropping its
      // refs, so GC later deletes by direct path (no directory scan)
      val homes: Map[String, String] = s.refs.filter(r => inputs.contains(r.filename))
        .map(r => r.filename -> r.physicalPartitionId).toMap
      val remaining =
        s.refs.filterNot(r => r.partitionId == partitionId && inputs.contains(r.filename))
      val orphaned = inputs.filterNot(f => remaining.exists(_.filename == f))
      // a compaction output rearranges rows the log already carries —
      // dataChange=false keeps the table-changes stream from re-emitting
      s.copy(
        refs = remaining ++ output.map(_.copy(dataChange = false)),
        gc = s.gc ++ orphaned.map(f => GCEntry(f, nowMs, homes.get(f))))
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
            r.dataChange))
      }
      s.copy(refs = next)
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
      require(field.nullable,
        s"added column ${field.name} must be nullable (existing files have no values for it)")
      s.copy(tree = s.tree.copy(schema = sch.copy(values = sch.values :+ field)))
    }
  }
}
