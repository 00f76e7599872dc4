package graft.queries

import org.apache.spark.sql.SparkSession

/** Input-proportional parallelism for the BATCH query surface — the
  * batch counterpart of streaming's `statePartitionsFor`.
  *
  * The session-level `spark.sql.shuffle.partitions` is a cluster-sized
  * constant (the harness pins it to the core count); every reduce stage
  * of every batch pipeline inherits it regardless of how much data
  * actually flows. At the small end that is pure overhead — scheduling,
  * codegen and AQE-round fixed costs on 32 near-empty tasks per shuffle
  * (measured: several of the dedup/SQL rows run FASTER on 8 cores than
  * 32 at sf0.1, a pure-overhead inversion) — and at the large end a
  * too-small constant under-partitions. So each query runs on a scoped
  * session whose shuffle parallelism is derived from its INPUT BYTES:
  *
  *   partitions = clamp(inputBytes / 4 MB, 1, session shuffle.partitions)
  *
  * The 4 MB-of-raw-input target was MEASURED, not guessed: at sf0.1
  * (17 MB) the dedup/verify reduces are CPU-bound enough that 1
  * partition regresses them (d3 2.0→3.4s, t42 4.1→5.5s) while 32 is
  * pure overhead (t12 1.48→0.66s at 4) — ~4 partitions is the basin.
  * Shingle/bucket explosions inflate input ~4-8x, so 4 MB of input is
  * 16-32 MB of real shuffle per partition; the session value stays the
  * CAP (and binds long before partition sizes reach the guide's
  * 100 MB-1 GB band at scale), so a
  * cluster-tuned deployment keeps its own ceiling and a 100-TB input
  * saturates it. AQE partition coalescing remains on top of this (the
  * derived count is the INITIAL partition number). Overrides:
  * `graft.batch.shufflePartitions` pins the count, `graft.batch.tune=false`
  * disables the scoping entirely. Partitioning is a throughput knob,
  * never a semantics one: every query ends in a total ORDER BY and
  * money sums accumulate in DECIMAL (QueryDef determinism rules), so
  * results are partition-count-invariant by construction.
  */
object BatchTuning {

  /** Raw input bytes per post-shuffle partition. */
  val TargetInputBytesPerPartition: Long = 4L << 20

  // dataset directories are immutable test fixtures; size them once
  private val dirBytes =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[graft] def inputBytes(dir: String): Long =
    dirBytes.computeIfAbsent(dir, { d =>
      try {
        val root = new java.io.File(d)
        def walk(f: java.io.File): Long =
          if (f.isFile) f.length()
          else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        walk(root)
      } catch { case scala.util.control.NonFatal(_) => 0L }
    })

  private[graft] def partitionsFor(spark: SparkSession, bytes: Long): Int =
    spark.conf.getOption("graft.batch.shufflePartitions").map(_.toInt).getOrElse {
      val cap = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
      val derived = math.ceil(
        bytes.toDouble / TargetInputBytesPerPartition).toInt
      math.max(1, math.min(derived, cap))
    }

  // ONE scoped session per (outer session, dataset, derived count),
  // shared by every query build: newSession() is NOT free — a fresh
  // SessionState re-initializes the analyzer and, far worse, the v2
  // catalog plumbing the lifecycle SQL queries register (measured: a
  // per-build session put +2-4s on every x*_sql row, 113s vs 82s bench
  // total). Memoizing restores the warm-catalog behavior of the shared
  // session while keeping the derived parallelism. Bounded: one entry
  // per (session, dir, count) — a handful per JVM.
  private val scoped = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int), SparkSession]()

  /** A dataset-scoped session (shared SparkContext and SharedState —
    * executors, caches — but its own SQL conf) with shuffle parallelism
    * derived from the dataset directory's size. Mirrors the streaming
    * drainSession contract.
    */
  def scaledSession(spark: SparkSession, sfDir: String): SparkSession = {
    if (spark.conf.getOption("graft.batch.tune").contains("false")) return spark
    val n = partitionsFor(spark, inputBytes(sfDir))
    scoped.computeIfAbsent((spark, sfDir, n), { key =>
      val s = key._1.newSession()
      s.conf.set("spark.sql.shuffle.partitions", key._3.toString)
      s
    })
  }
}
