package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
  * Each query runs under the same watchdog as Verify (a hung query
  * costs its timeout, not the round): timed-out/failed queries report
  * -1 so the driver can see exactly which ones died.
  */
object Bench {

  /** Fraction of the machine's CPU consumed by OTHER processes over a
    * `ms` sampling window (`/proc/stat` busy jiffies minus our own
    * `/proc/self/stat` utime+stime). This — not `/proc/loadavg`, whose
    * 1-minute EMA is dominated by OUR just-finished queries — is the
    * signal that invalidated BENCH_r12: the scale/endurance section was
    * recorded while an unrelated workload held the box and every number
    * came out 6-9x worse than the engine's idle reality. Returns -1 when
    * /proc isn't readable (non-Linux).
    */
  def foreignCpuShare(ms: Long): Double = {
    def slurp(p: String): String = {
      val s = scala.io.Source.fromFile(p)
      try s.mkString finally s.close()
    }
    def totals(): (Long, Long) = {
      val cpu = slurp("/proc/stat").linesIterator.next()
        .trim.split("\\s+").drop(1).map(_.toLong)
      val idle = cpu(3) + (if (cpu.length > 4) cpu(4) else 0L)
      (cpu.sum, idle)
    }
    def selfJiffies(): Long = {
      // field 2 (comm) may contain spaces; split after the closing paren
      val f = slurp("/proc/self/stat")
      val rest = f.substring(f.lastIndexOf(')') + 2).split(" ")
      rest(11).toLong + rest(12).toLong // utime, stime (fields 14,15)
    }
    try {
      val (t0, i0) = totals(); val s0 = selfJiffies()
      Thread.sleep(ms)
      val (t1, i1) = totals(); val s1 = selfJiffies()
      val busy = (t1 - t0) - (i1 - i0)
      val foreign = busy - (s1 - s0)
      if (t1 > t0) math.max(0.0, foreign.toDouble / (t1 - t0)) else 0.0
    } catch { case scala.util.control.NonFatal(_) => -1.0 }
  }

  /** Load guard: refuse to start a measured section while other
    * processes hold more than `threshold` of the box — wait (up to
    * `maxWaitSec`, re-sampling) for them to drain, and report what was
    * seen so a contaminated recording is self-describing instead of a
    * silent lie. Returns (foreignShareAtStart, waitedSec, stillBusy).
    */
  def awaitIdle(threshold: Double, maxWaitSec: Int): (Double, Int, Boolean) = {
    val first = foreignCpuShare(1000)
    if (first < 0 || first <= threshold) return (first, 0, false)
    var waited = 0
    var share = first
    while (share > threshold && waited < maxWaitSec) {
      Thread.sleep(5000); waited += 5
      share = foreignCpuShare(1000); waited += 1
    }
    (share, waited, share > threshold)
  }

  /** Calibration control (VERDICT r14 #2): a fixed, engine-independent
    * workload timed immediately before each measured section, so
    * round-over-round comparisons have a machine-day denominator.
    * Three components cover the three ambient axes that have moved
    * past rounds' numbers: shuffle+CPU (sort_agg), disk/parquet IO
    * (parquet_io), and micro-batch scheduler drain (stream_drain — the
    * axis behind t34/t40's 2-3x identical-binary swings, DRIFT_r14).
    * Each runs twice and reports the min: a slow DAY stays slow across
    * both runs, one-off JIT/page-cache noise doesn't. Compare sections
    * ACROSS rounds by dividing per-query seconds by the matching
    * calibration total.
    */
  def calibrate(spark: SparkSession): (Double, String) = {
    import org.apache.spark.sql.functions._
    def sortAgg(): Unit = {
      spark.range(0, 20000000L, 1, 32)
        .select((col("id") * 2654435761L % 1000003L).as("k"), (col("id") % 97).as("v"))
        .groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
        .orderBy(desc("s")).limit(5).collect()
      ()
    }
    def parquetIo(): Unit = {
      val dir = s"/tmp/graft-calib-${java.util.UUID.randomUUID()}"
      try {
        spark.range(0, 2000000L, 1, 8)
          .select(col("id"), (col("id") * 31 % 1000).as("v"),
            concat(lit("row-"), col("id")).as("s"))
          .write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir).filter(col("v") < 500)
          .agg(sum("id")).collect()
        ()
      } finally graft.meta.GraftFS.deleteRecursive(dir)
    }
    def streamDrain(): Unit = {
      val dir = s"/tmp/graft-calib-st-${java.util.UUID.randomUUID()}"
      try {
        // match the engine's drain checkpoint settings (StreamTuning):
        // the control measures the ambient micro-batch axis as the
        // engine's own drains experience it
        graft.streaming.StreamTuning.tune(spark, Some(s"$dir/ck"))
        spark.range(0, 5000L).select(col("id"), (col("id") % 7).as("g"))
          .write.mode("overwrite").parquet(s"$dir/in")
        val q = spark.readStream.schema("id LONG, g LONG")
          .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
          .groupBy("g").count()
          .writeStream.format("memory").queryName(
            s"calib_${math.abs(dir.hashCode)}")
          .outputMode("complete")
          .option("checkpointLocation", s"$dir/ck").start()
        try { q.processAllAvailable() } finally q.stop()
      } finally graft.meta.GraftFS.deleteRecursive(dir)
    }
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    def best(f: () => Unit): Double = math.min(time(f), time(f))
    val sa = best(sortAgg _)
    val pio = best(parquetIo _)
    val sd = best(streamDrain _)
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val total = r3(sa + pio + sd)
    (total,
      s"""{"sort_agg":${r3(sa)},"parquet_io":${r3(pio)},"stream_drain":${r3(sd)},"total":$total}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "120").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen paths, parquet footer/readers, shuffle
    // machinery) so the first measured query isn't charged for it.
    Verify.runBounded(spark, "warmup", timeoutSec) {
      spark.range(1000000).selectExpr("sum(id)").count()
      graft.Tables(spark, sfDir, "lineitem").limit(1000).count()
      graft.Tables(spark, sfDir, "documents").limit(100).count()
      ()
    }
    // Best-of-two per query: a second run (skipped once a query has
    // already cost REPEAT_CAP seconds) and the minimum reported. A single
    // cold run charges whichever query happens to go first for JIT /
    // reader warm-up and hands every query machine-noise jitter; the
    // minimum of two is the steady-state number a cluster would see.
    // The cap defaults to 60s (was 10): with ambient machine load a
    // contended first run can blow past a small cap, and "warm = the
    // contended cold run" fabricates 20-170x regressions (BENCH_r08).
    // Re-running a 17s query costs seconds; a fabricated regression
    // costs a round of misdirected tuning.
    val repeatCap = sys.env.getOrElse("SPARK_GRAFT_REPEAT_CAP", "60").toDouble
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = Verify.runBounded(spark, name, timeoutSec) { fn(spark, sfDir).count(): Unit }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // Both runs are reported: `queries` carries the best (the number to
    // trend round-over-round), `queries_cold` the first run — so one-off
    // costs a warm run hides (JVM warm-up, the lifecycle queries'
    // memoized table build) stay visible instead of silently vanishing.
    // Load guard (BENCH_r12 lesson): never start a measured section on a
    // busy box; if it stays busy past the wait budget, run anyway but
    // stamp busy=true into the record so nobody tunes against it.
    val loadThreshold = sys.env.getOrElse("SPARK_GRAFT_LOAD_THRESHOLD", "0.10").toDouble
    val loadWaitSec = sys.env.getOrElse("SPARK_GRAFT_LOAD_WAIT", "300").toInt
    def loadJson(tag: String): String = {
      val (share, waited, busy) = awaitIdle(loadThreshold, loadWaitSec)
      if (busy || waited > 0)
        System.err.println(s"[bench] load guard ($tag): foreign_cpu=$share waited=${waited}s busy=$busy")
      s""""$tag":{"foreign_cpu":${math.rint(share * 1000) / 1000},"waited_sec":$waited,"busy":$busy}"""
    }
    val loadQ = loadJson("queries")
    val (calibQ, calibQJson) = calibrate(spark)
    val cold = scala.collection.mutable.LinkedHashMap[String, Double]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val first = timeOnce(name, fn)
      cold(name) = first
      val best =
        if (first >= 0 && first < repeatCap) {
          val second = timeOnce(name, fn)
          if (second >= 0) math.min(first, second) else first
        } else first
      name -> best
    }
    // 4-decimal seconds: full double precision triples the JSON line's
    // length, and the round driver captures only the TAIL of the output —
    // a bloated line gets its head (and the leading '{') truncated away,
    // which is exactly what nulled BENCH_r06's parsed field.
    def r4(v: Double): Double = math.rint(v * 1e4) / 1e4
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val qsCold = cold.map { case (k, v) => "\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val total = r4(results.values.filter(_ >= 0).sum)
    // Scale-stress section (x10 engine dataflows, x3 dedup corpora) in
    // rows/s — BASELINE-comparable numbers where fixed overhead doesn't
    // dominate. SPARK_GRAFT_SCALE=0 skips it.
    val (loadS, calibSJson, scale) =
      if (sys.env.getOrElse("SPARK_GRAFT_SCALE", "1") == "0")
        ("\"scale\":{\"skipped\":true}", "{}", "{}")
      else {
        val l = loadJson("scale")
        val (_, cj) = calibrate(spark)
        (l, cj, BenchScale.run(spark, sfDir, timeoutSec))
      }
    // Real-executor check: the headline queries re-run in a fresh JVM
    // under local-cluster[2,2,2048] (separate executor processes, real
    // serialization + shuffle service) — the per-query secs/hashes land
    // in the bench record. SPARK_GRAFT_CLUSTER=0 skips it.
    val cluster =
      if (sys.env.getOrElse("SPARK_GRAFT_CLUSTER", "1") == "0") "{}"
      else try {
        val (code, cjson) = ClusterCheck.runAsProcess("/root/testdata/sf0.01")
        if (code == 0 && cjson.startsWith("{")) cjson
        else s"""{"error":"exit $code"}"""
      } catch { case e: Throwable => s"""{"error":"${String.valueOf(e).replaceAll("[\"\\\\]", " ").take(120)}"}""" }
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","load":{$loadQ,$loadS},""" +
      s""""calibration":{"queries":$calibQJson,"scale":$calibSJson},""" +
      s""""queries":$qs,"queries_cold":$qsCold,"scale":$scale,"cluster":$cluster,"sf":"$sfDir"}"""
    // Durable full record first; then a COMPACT JSON line as the very
    // LAST stdout line (after spark.stop(), whose shutdown logging goes
    // to stderr). The round driver keeps only the final ~2000 chars of
    // stdout and parses the last line within them — the full record
    // (~10 KB once queries_cold/scale/cluster exist) gets its head, and
    // with it the leading '{', truncated away, which is exactly what
    // nulled every BENCH_rN.parsed through round 11. The compact line
    // carries the totals plus the most expensive queries that fit in a
    // 1400-char budget; bench_out.json remains the authoritative record.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json + "\n")
    catch { case scala.util.control.NonFatal(_) => () }
    val failed = results.collect { case (k, v) if v < 0 => k }
    val byCost = results.toSeq.sortBy(-_._2)
    val picked = scala.collection.mutable.ArrayBuffer[String]()
    var budget = 1400
    byCost.foreach { case (k, v) =>
      val ent = "\"" + k + "\":" + math.rint(v * 100) / 100
      if (ent.length + 1 <= budget) { picked += ent; budget -= ent.length + 1 }
    }
    val anyBusy = (loadQ + loadS).contains("\"busy\":true")
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"busy":$anyBusy,""" +
      s""""calibration_sec":$calibQ,""" +
      s""""failed":${failed.mkString("[\"", "\",\"", "\"]").replace("[\"\"]", "[]")},""" +
      s""""queries":${picked.mkString("{", ",", "}")},""" +
      s""""full":"bench_out.json","sf":"$sfDir"}"""
    try spark.stop() catch { case scala.util.control.NonFatal(_) => () }
    println(compact)
  }
}
