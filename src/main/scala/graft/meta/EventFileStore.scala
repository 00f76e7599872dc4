package graft.meta

import java.util.concurrent.atomic.AtomicLong
import org.apache.hadoop.fs.Path

/** Durable last-record-wins record store over [[GraftFS]] — the
  * filesystem counterpart of the reference's DynamoDB tracker tables
  * (reference: java/compaction/compaction-tracker and
  * java/query/query-core's DynamoDBQueryTracker, both plain upsert
  * tables). Object stores have no append primitive, so an upsert is
  * expressed CAS-free as: each `append` lands ONE immutable record
  * file with a writer-unique, time-ordered name, and readers fold the
  * records in filename order so the newest record per key wins.
  * Any number of processes may append concurrently — names never
  * collide — and any process reads the merged view with a single
  * directory listing; no locks, no CAS, no read-modify-write.
  *
  * Record visibility is atomic: the record is staged to a dot-tmp name
  * and renamed into place, so a concurrent reader never parses a torn
  * write (and a record that still fails to parse is skipped, never
  * fatal — one lost status beat, not a wedged tracker).
  *
  * Scale shape: writes are O(1); reads list + parse O(records). That
  * is the right trade for operational trackers (records are small,
  * bounded by job/query count, and read by dashboards, not the data
  * path). `prune` keeps long-lived directories bounded.
  */
final class EventFileStore(dir: String) {
  GraftFS.mkdirs(dir)

  private val writerId = java.util.UUID.randomUUID().toString.take(8)
  private val seq = new AtomicLong()

  /** Persist one record. Zero-padded millis + per-writer sequence make
    * lexicographic filename order chronological (per writer exactly;
    * across writers to clock precision — ties resolve deterministically
    * by writer id, which is all an upsert race can promise).
    */
  def append(json: String): Unit = {
    val name = f"ev-${System.currentTimeMillis()}%013d-$writerId-${seq.incrementAndGet()}%06d.json"
    val (fs, d) = GraftFS.resolve(dir)
    val tmp = new Path(d, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    GraftFS.rename(tmp, new Path(d, name), fs)
  }

  /** All records in commit (filename) order; unparseable or vanished
    * files are the caller's concern — this returns raw text only for
    * files fully renamed into place.
    */
  def readAll(): Seq[String] = {
    val names = GraftFS.list(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("ev-") && n.endsWith(".json")).sorted
    names.flatMap { n =>
      try Some(GraftFS.readString(s"$dir/$n"))
      catch { case scala.util.control.NonFatal(_) => None } // raced a pruner
    }
  }

  /** Best-effort: drop all but the newest `keep` records (terminal
    * states live in the newest record per key, so pruning only forgets
    * the oldest keys' history).
    */
  def prune(keep: Int): Unit = {
    val names = GraftFS.list(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("ev-") && n.endsWith(".json")).sorted
    names.dropRight(keep).foreach { n =>
      try GraftFS.delete(s"$dir/$n")
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
