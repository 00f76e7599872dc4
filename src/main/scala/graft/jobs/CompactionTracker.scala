package graft.jobs

import java.util.concurrent.ConcurrentHashMap

/** Compaction job status tracking, mirroring the reference's tracker
  * model (reference: java/core/src/main/java/sleeper/core/tracker/
  * compaction/job/CompactionJobTracker.java with the created / started /
  * finished / committed / failed event family, backed there by DynamoDB
  * in java/compaction/compaction-tracker). graft's compactions are
  * synchronous Spark jobs, so — exactly like the query tracker (x6) —
  * the value is operational visibility behind the same state machine,
  * with a store seam a durable backend can implement.
  *
  * State order matches the reference's lifecycle: CREATED (planned,
  * input files assigned) → STARTED (merge running) → FINISHED (output
  * written, not yet in the state store) → COMMITTED (state store
  * replace landed) | FAILED.
  */
sealed abstract class CompactionJobState(val name: String) {
  override def toString: String = name
}

object CompactionJobState {
  case object Created extends CompactionJobState("CREATED")
  case object Started extends CompactionJobState("STARTED")
  case object Finished extends CompactionJobState("FINISHED")
  case object Committed extends CompactionJobState("COMMITTED")
  case object Failed extends CompactionJobState("FAILED")

  val values: Seq[CompactionJobState] = Seq(Created, Started, Finished, Committed, Failed)

  def fromName(n: String): CompactionJobState =
    values.find(_.name == n).getOrElse(throw new IllegalArgumentException(s"unknown state $n"))
}

/** One job's last known status (reference: CompactionJobStatus — job id,
  * partition, input file count, run statuses with row counts).
  */
final case class TrackedCompactionJob(
    jobId: String,
    partitionId: String,
    inputFiles: Int,
    state: CompactionJobState = CompactionJobState.Created,
    lastUpdateMs: Long = 0L,
    rowsWritten: Option[Long] = None,
    errorMessage: Option[String] = None)

/** Storage seam (reference: CompactionJobTracker, implemented there by
  * DynamoDBCompactionJobTracker). `put` is an upsert keyed on jobId.
  */
trait CompactionJobTracker {
  def put(t: TrackedCompactionJob): Unit
  def get(jobId: String): Option[TrackedCompactionJob]
  def all: Seq[TrackedCompactionJob]
  def inState(s: CompactionJobState): Seq[TrackedCompactionJob] = all.filter(_.state == s)
  /** Jobs not yet terminal — the reference's "unfinished" report. */
  def unfinished: Seq[TrackedCompactionJob] = all.filter(t => t.state match {
    case CompactionJobState.Committed | CompactionJobState.Failed => false
    case _ => true
  })
}

object CompactionJobTracker {
  /** The reference's `CompactionJobTracker.NONE`: record nothing. */
  val Noop: CompactionJobTracker = new CompactionJobTracker {
    override def put(t: TrackedCompactionJob): Unit = ()
    override def get(jobId: String): Option[TrackedCompactionJob] = None
    override def all: Seq[TrackedCompactionJob] = Nil
  }
}

/** In-memory tracker store: concurrent upserts keyed on jobId. */
final class InMemoryCompactionJobTracker extends CompactionJobTracker {
  private val m = new ConcurrentHashMap[String, TrackedCompactionJob]()
  override def put(t: TrackedCompactionJob): Unit = m.put(t.jobId, t)
  override def get(jobId: String): Option[TrackedCompactionJob] = Option(m.get(jobId))
  override def all: Seq[TrackedCompactionJob] =
    m.values().toArray(Array.empty[TrackedCompactionJob]).toSeq.sortBy(_.jobId)
}
