package graft.streaming

import org.apache.spark.sql.SparkSession

/** Per-session checkpoint tuning for the engine's streaming entry
  * points. Spark 4.1 turned on two per-commit costs that dominate
  * micro-batch latency on filesystems without a fast rename/CRC path:
  *
  *  1. `spark.sql.streaming.checkpoint.fileChecksum.enabled` (new in
  *     4.1, default true) writes a checksum SIDECAR for every
  *     checkpoint file — offset log, commit log, and every state-store
  *     delta — and every stream close() BLOCKS on the sidecar write
  *     through a shared thread pool. Profiled here (DrainProfile, 32
  *     partitions × 32 one-file micro-batches): ~60% of all executor
  *     task samples sat in `ChecksumCancellableFSDataOutputStream
  *     .close` waiting on that pool; state-store commitTimeMs averaged
  *     ~860 ms per partition for a 7-row store. The engine's tables
  *     already carry end-to-end content checks (parquet page CRCs,
  *     committed-file row counts), so the sidecars buy corruption
  *     detection the storage layer mostly duplicates — off by default,
  *     `graft.streaming.checkpointFileChecksum=true` re-enables.
  *
  *  2. The default FileContext-based checkpoint manager routes EVERY
  *     rename through Hadoop's AbstractFileSystem → `FileSystem.rename`
  *     precondition checks, which on RawLocalFileSystem shell out
  *     (`readlink`/`stat` PROCESS FORKS, ~10-30 ms each) once per
  *     committed checkpoint file. The FileSystem-based manager renames
  *     via `File.renameTo` — atomic on POSIX local filesystems, no
  *     forks. Applied only when the checkpoint lives on `file:` (on
  *     HDFS/object stores the FileContext manager keeps its atomicity
  *     rationale); `graft.streaming.checkpointFileManager` overrides.
  *
  * Neither setting changes any query result — they gate durability
  * instrumentation of the checkpoint files themselves. Both are
  * conf-overridable so a deployment on storage that wants the sidecars
  * (or lacks atomic rename) can put them back.
  */
object StreamTuning {

  private val FsBasedManager =
    "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager"

  private def isLocal(path: String): Boolean =
    try {
      val (fs, _) = graft.meta.GraftFS.resolve(path)
      fs.getScheme == "file"
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Apply the drain tuning to `spark` for a stream whose checkpoint
    * lives at `checkpointPath` (None = Spark's temp checkpoint under
    * java.io.tmpdir, which is local by construction).
    */
  def tune(spark: SparkSession, checkpointPath: Option[String] = None): Unit = {
    val checksum = spark.conf.getOption("graft.streaming.checkpointFileChecksum")
      .getOrElse("false")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", checksum)
    val manager = spark.conf.getOption("graft.streaming.checkpointFileManager")
      .getOrElse(if (checkpointPath.forall(isLocal)) FsBasedManager else "")
    if (manager.nonEmpty)
      spark.conf.set("spark.sql.streaming.checkpointFileManagerClass", manager)
    else
      // non-local checkpoint: RESET rather than leave a FileSystem-based
      // manager from an earlier local-checkpoint tune on this shared
      // session — HDFS/object-store streams must keep the FileContext
      // default and its atomic-rename rationale
      spark.conf.unset("spark.sql.streaming.checkpointFileManagerClass")
  }
}
