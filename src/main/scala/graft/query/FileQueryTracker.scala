package graft.query

import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.meta.EventFileStore

/** Durable [[QueryTrackerStore]] over a shared directory — the
  * filesystem stand-in for the reference's DynamoDBQueryTracker
  * (reference: java/query/query-core/.../tracker/DynamoDBQueryTracker
  * usage, docs/usage/query.md "query status"): every `put` persists an
  * immutable record file via [[graft.meta.EventFileStore]], and reads
  * fold the directory newest-record-per-(queryId, subQueryId). Two
  * processes pointed at the same directory — a [[QueryRunner]] JVM and
  * a status-polling client — see one merged tracker, which is what
  * makes out-of-process submission's status REAL rather than lost with
  * the runner's heap.
  */
final class FileQueryTracker(dir: String) extends QueryTrackerStore {

  private val store = new EventFileStore(dir)

  override def put(t: TrackedQuery): Unit = store.append(FileQueryTracker.toJson(t))

  override def get(queryId: String, subQueryId: Option[String]): Option[TrackedQuery] =
    reduced().get((queryId, subQueryId))

  override def all: Seq[TrackedQuery] =
    reduced().values.toSeq.sortBy(t => (t.queryId, t.subQueryId))

  private def reduced(): Map[(String, Option[String]), TrackedQuery] =
    store.readAll().flatMap(FileQueryTracker.fromJson)
      .foldLeft(Map.empty[(String, Option[String]), TrackedQuery]) { (m, t) =>
        m + ((t.queryId, t.subQueryId) -> t) // filename order: last record wins
      }
}

object FileQueryTracker {

  private[query] def toJson(t: TrackedQuery): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      "queryId" -> JString(t.queryId),
      "subQueryId" -> t.subQueryId.map(JString(_)).getOrElse(JNothing),
      "state" -> JString(t.state.name),
      "lastUpdateMs" -> JInt(t.lastUpdateMs),
      "rowCount" -> t.rowCount.map(JInt(_)).getOrElse(JNothing),
      "errorMessage" -> t.errorMessage.map(JString(_)).getOrElse(JNothing))))

  /** None for records that do not parse (a foreign file in the dir) —
    * skipped, never fatal.
    */
  private[query] def fromJson(text: String): Option[TrackedQuery] =
    try {
      val m = JsonMethods.parse(text).asInstanceOf[JObject].obj.toMap
      def str(k: String) = m.get(k).collect { case JString(s) => s }
      def num(k: String) = m.get(k).collect { case JInt(n) => n.toLong }
      Some(TrackedQuery(
        queryId = str("queryId").get,
        subQueryId = str("subQueryId"),
        state = QueryState.fromName(str("state").get),
        lastUpdateMs = num("lastUpdateMs").getOrElse(0L),
        rowCount = num("rowCount"),
        errorMessage = str("errorMessage")))
    } catch { case scala.util.control.NonFatal(_) => None }
}
