package graft.reports

import graft.core.Partition
import graft.jobs.{CompactionJobState, CompactionJobTracker}
import graft.query.{QueryState, QueryTrackerStore}
import graft.table.GraftTable

/** Human-facing operator status reports over the durable trackers and
  * the state store — the engine's counterpart of the reference's admin
  * report surface (reference: java/clients/src/main/java/sleeper/clients/
  * report/{FilesStatusReport,PartitionsStatusReport,
  * CompactionJobStatusReport,IngestJobStatusReport,QueryTrackerReport}
  * .java and report/filestatus/StandardFileStatusReporter.java). The
  * repo already had the durable substrate (state store, file trackers);
  * these render it.
  *
  * Every report reads ONLY tracker/state-store metadata — O(files +
  * partitions + tracked jobs), never data files — so they are safe to
  * run against a 100-TB table from an operator laptop, exactly like the
  * reference's reports against DynamoDB.
  *
  * Reports return the rendered text; [[ReportMain]] is the CLI wrapper.
  */
object StatusReports {

  private def pct(xs: Seq[Int], p: Double): Double =
    if (xs.isEmpty) 0.0
    else {
      val s = xs.sorted
      val rank = p * (s.size - 1)
      val lo = s(math.floor(rank).toInt)
      val hi = s(math.ceil(rank).toInt)
      lo + (hi - lo) * (rank - math.floor(rank))
    }

  private def refStatsLine(counts: Seq[Int], kind: String): String =
    if (counts.isEmpty || counts.sum == 0)
      s"Number of file references in $kind partitions: 0"
    else
      f"Number of file references in $kind partitions: min = ${counts.min}%d, max = ${counts.max}%d, " +
        f"mean = ${counts.sum.toDouble / counts.size}%.3f, median = ${pct(counts, 0.5)}%.3f, " +
        f"90th percentile = ${pct(counts, 0.9)}%.3f, total = ${counts.sum}%d"

  /** Files status (reference: FilesStatusReport + StandardFileStatusReporter):
    * partition counts, referenced/unreferenced file counts (unreferenced =
    * awaiting garbage collection), per-partition reference statistics and
    * row totals; `verbose` lists every file.
    */
  def filesStatus(table: GraftTable, verbose: Boolean = false): String = {
    val refs = table.store.fileReferences
    val tree = table.store.partitionTree
    val gc = table.store.unreferencedFiles
    val leafIds = tree.leaves.map(_.id).toSet
    val byPartition = refs.groupBy(_.partitionId)
    val leafCounts = tree.leaves.map(p => byPartition.getOrElse(p.id, Nil).size)
    val nonLeafCounts = tree.partitions.filterNot(_.isLeaf)
      .map(p => byPartition.getOrElse(p.id, Nil).size)
    val sb = new StringBuilder
    sb ++= "Files Status Report:\n--------------------------\n"
    sb ++= s"There are ${tree.leaves.size} leaf partitions and ${tree.partitions.size - tree.leaves.size} non-leaf partitions\n"
    sb ++= s"Number of files with references: ${refs.map(_.filename).distinct.size}\n"
    sb ++= s"Number of files with no references, which will be garbage collected: ${gc.size}\n"
    sb ++= s"Number of references to files: ${refs.size}\n"
    sb ++= refStatsLine(leafCounts, "leaf") + "\n"
    sb ++= refStatsLine(nonLeafCounts, "non-leaf") + "\n"
    val leafRows = refs.filter(r => leafIds(r.partitionId)).map(_.rowCount).sum
    sb ++= s"Number of rows referenced in leaf partitions: $leafRows\n"
    sb ++= s"Number of rows referenced in non-leaf partitions: ${refs.map(_.rowCount).sum - leafRows}\n"
    if (verbose) {
      sb ++= "\nFiles with references:\n"
      refs.sortBy(r => (r.partitionId, r.filename)).foreach { r =>
        sb ++= s"  ${r.partitionId}  ${r.filename}  rows=${r.rowCount}${r.jobId.map(j => s"  job=$j").getOrElse("")}\n"
      }
      sb ++= "\nFiles with no references (awaiting GC):" + (if (gc.isEmpty) " none\n" else "\n")
      gc.sortBy(_.filename).foreach(g => sb ++= s"  ${g.filename}\n")
    }
    sb.result()
  }

  private def rangeStr(p: Partition): String =
    p.region.ranges.map { r =>
      val lo = r.min.map(_.toString).getOrElse("-inf")
      val hi = r.max.map(_.toString).getOrElse("+inf")
      s"[$lo, $hi)"
    }.mkString(" x ")

  /** Partitions status (reference: PartitionsStatusReport /
    * splitter.core.status.PartitionsStatus): every partition with its
    * key range, file/row counts, and whether the split threshold marks
    * it as needing a split.
    */
  def partitionsStatus(table: GraftTable): String = {
    val tree = table.store.partitionTree
    val refs = table.store.fileReferences.groupBy(_.partitionId)
    val threshold = table.config.splitThreshold
    val leaves = tree.leaves
    def rows(id: String): Long = refs.getOrElse(id, Nil).map(_.rowCount).sum
    val needSplit = leaves.filter(l => rows(l.id) > threshold)
    val sb = new StringBuilder
    sb ++= "Partitions Status Report:\n--------------------------\n"
    sb ++= s"There are ${tree.partitions.size} partitions (${leaves.size} leaf partitions)\n"
    sb ++= s"Split threshold is $threshold rows\n"
    sb ++= s"There are ${needSplit.size} leaf partitions that need splitting\n"
    tree.partitions.sortBy(_.id).foreach { p =>
      val kind = if (p.isLeaf) "leaf" else "internal"
      val split = p.splitPoint.map(v => s", split at $v").getOrElse("")
      val need = if (p.isLeaf && rows(p.id) > threshold) ", NEEDS SPLITTING" else ""
      sb ++= s"  ${p.id} ($kind): range ${rangeStr(p)}, files=${refs.getOrElse(p.id, Nil).size}, rows=${rows(p.id)}$split$need\n"
    }
    sb.result()
  }

  /** Compaction job status (reference: CompactionJobStatusReport /
    * report/job/StandardProcessRunReporter): totals by state plus one
    * line per job, newest update first.
    */
  def compactionJobs(tracker: CompactionJobTracker): String = {
    val all = tracker.all
    val sb = new StringBuilder
    sb ++= "Compaction Job Status Report:\n--------------------------\n"
    sb ++= s"Total jobs: ${all.size}\n"
    CompactionJobState.values.foreach { s =>
      sb ++= s"Jobs ${s.name}: ${all.count(_.state == s)}\n"
    }
    sb ++= s"Jobs unfinished: ${tracker.unfinished.size}\n"
    all.sortBy(-_.lastUpdateMs).foreach { j =>
      val rows = j.rowsWritten.map(r => s", rows=$r").getOrElse("")
      val err = j.errorMessage.map(e => s", error=$e").getOrElse("")
      sb ++= s"  ${j.jobId}: ${j.state.name} partition=${j.partitionId} inputFiles=${j.inputFiles}$rows$err\n"
    }
    sb.result()
  }

  /** Query tracker report (reference: QueryTrackerReport /
    * TrackedQueryProgressReport): totals by state plus one line per
    * tracked (sub-)query, newest update first.
    */
  def queries(store: QueryTrackerStore): String = {
    val all = store.all
    val sb = new StringBuilder
    sb ++= "Query Status Report:\n--------------------------\n"
    sb ++= s"Total tracked queries: ${all.size}\n"
    QueryState.values.foreach { s =>
      sb ++= s"Queries ${s.name}: ${all.count(_.state == s)}\n"
    }
    all.sortBy(-_.lastUpdateMs).foreach { q =>
      val sub = q.subQueryId.map(s => s"/$s").getOrElse("")
      val rows = q.rowCount.map(r => s", rows=$r").getOrElse("")
      val err = q.errorMessage.map(e => s", error=$e").getOrElse("")
      sb ++= s"  ${q.queryId}$sub: ${q.state.name}$rows$err\n"
    }
    sb.result()
  }

  /** Ingest report (reference: IngestJobStatusReport): the ingest
    * backlog as the state store knows it NOW — files still carrying raw
    * ingested rows (`dataChange=true`, i.e. runs compaction has not yet
    * folded) versus compaction rewrites. An operator reads this as "how
    * far behind is compaction on what arrived".
    */
  def ingest(table: GraftTable): String = {
    val refs = table.store.fileReferences
    val (ingested, rewrites) = refs.partition(_.dataChange)
    val sb = new StringBuilder
    sb ++= "Ingest Status Report:\n--------------------------\n"
    sb ++= s"Ingested files awaiting compaction: ${ingested.map(_.filename).distinct.size}\n"
    sb ++= s"Ingested rows awaiting compaction: ${ingested.map(_.rowCount).sum}\n"
    sb ++= s"Files from compaction rewrites: ${rewrites.map(_.filename).distinct.size}\n"
    sb ++= s"Rows in compacted files: ${rewrites.map(_.rowCount).sum}\n"
    sb ++= s"Total rows referenced: ${refs.map(_.rowCount).sum}\n"
    sb.result()
  }

  /** The combined dashboard (reference: StatusReport.java runs the full
    * set back-to-back).
    */
  def full(table: GraftTable, compactions: CompactionJobTracker,
      queryStore: QueryTrackerStore): String =
    Seq(filesStatus(table), partitionsStatus(table), ingest(table),
      compactionJobs(compactions), queries(queryStore)).mkString("\n")

  // -- DataFrame-shaped variants: the same metadata-only numbers as
  //    queryable relations, so reports compose with SQL (and the driver
  //    oracle can gate them against ground truth recomputed from data).

  /** One row per LEAF partition in key order of the first row-key
    * dimension: (leaf_key = inclusive lower bound as a string, "-inf"
    * for the unbounded first leaf; n_files; n_rows from committed footer
    * counts; needs_split vs the table's split threshold).
    */
  def partitionsStatusDF(table: GraftTable): org.apache.spark.sql.DataFrame = {
    val spark = table.spark
    import spark.implicits._
    val refs = table.store.fileReferences.groupBy(_.partitionId)
    val threshold = table.config.splitThreshold
    def loKey(p: Partition): Option[Any] = p.region.ranges.head.min
    val rows = table.store.partitionTree.leaves
      .map { l =>
        val rs = refs.getOrElse(l.id, Nil)
        (loKey(l).map(_.toString).getOrElse("-inf"),
          rs.size.toLong, rs.map(_.rowCount).sum)
      }
      .sortBy(_._1)
      .map { case (lo, files, n) => (lo, files, n, n > threshold) }
    rows.toDF("leaf_key", "n_files", "n_rows", "needs_split")
  }

  /** One summary row: partition/file/reference/row totals plus the GC
    * backlog — the numbers the text [[filesStatus]] header prints.
    */
  def filesStatusDF(table: GraftTable): org.apache.spark.sql.DataFrame = {
    val spark = table.spark
    import spark.implicits._
    val refs = table.store.fileReferences
    val tree = table.store.partitionTree
    Seq((
      tree.leaves.size.toLong,
      (tree.partitions.size - tree.leaves.size).toLong,
      refs.map(_.filename).distinct.size.toLong,
      table.store.unreferencedFiles.size.toLong,
      refs.size.toLong,
      refs.map(_.rowCount).sum))
      .toDF("leaf_partitions", "nonleaf_partitions", "files_referenced",
        "files_awaiting_gc", "n_references", "n_rows")
  }
}
