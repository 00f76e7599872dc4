package graft.jobs

import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.meta.EventFileStore

/** Durable [[CompactionJobTracker]] over a shared directory — the
  * filesystem stand-in for the reference's DynamoDB compaction tracker
  * (reference: java/compaction/compaction-tracker,
  * DynamoDBCompactionJobTracker): every `put` persists an immutable
  * record file via [[graft.meta.EventFileStore]]; reads fold the
  * directory newest-record-per-jobId, so a compaction worker JVM and
  * an operational dashboard pointed at the same directory share one
  * job-status view.
  */
final class FileCompactionJobTracker(dir: String) extends CompactionJobTracker {

  private val store = new EventFileStore(dir)

  override def put(t: TrackedCompactionJob): Unit =
    store.append(FileCompactionJobTracker.toJson(t))

  override def get(jobId: String): Option[TrackedCompactionJob] = reduced().get(jobId)

  override def all: Seq[TrackedCompactionJob] = reduced().values.toSeq.sortBy(_.jobId)

  private def reduced(): Map[String, TrackedCompactionJob] =
    store.readAll().flatMap(FileCompactionJobTracker.fromJson)
      .foldLeft(Map.empty[String, TrackedCompactionJob]) { (m, t) =>
        m + (t.jobId -> t) // filename order: last record wins
      }
}

object FileCompactionJobTracker {

  private[jobs] def toJson(t: TrackedCompactionJob): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      "jobId" -> JString(t.jobId),
      "partitionId" -> JString(t.partitionId),
      "inputFiles" -> JInt(t.inputFiles),
      "state" -> JString(t.state.name),
      "lastUpdateMs" -> JInt(t.lastUpdateMs),
      "rowsWritten" -> t.rowsWritten.map(JInt(_)).getOrElse(JNothing),
      "errorMessage" -> t.errorMessage.map(JString(_)).getOrElse(JNothing))))

  private[jobs] def fromJson(text: String): Option[TrackedCompactionJob] =
    try {
      val m = JsonMethods.parse(text).asInstanceOf[JObject].obj.toMap
      def str(k: String) = m.get(k).collect { case JString(s) => s }
      def num(k: String) = m.get(k).collect { case JInt(n) => n.toLong }
      Some(TrackedCompactionJob(
        jobId = str("jobId").get,
        partitionId = str("partitionId").get,
        inputFiles = num("inputFiles").get.toInt,
        state = CompactionJobState.fromName(str("state").get),
        lastUpdateMs = num("lastUpdateMs").getOrElse(0L),
        rowsWritten = num("rowsWritten"),
        errorMessage = str("errorMessage")))
    } catch { case scala.util.control.NonFatal(_) => None }
}
