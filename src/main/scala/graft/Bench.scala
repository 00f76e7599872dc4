package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
  * Each query runs under the same watchdog as Verify (a hung query
  * costs its timeout, not the round): timed-out/failed queries report
  * -1 so the driver can see exactly which ones died.
  */
object Bench {
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
    val scale =
      if (sys.env.getOrElse("SPARK_GRAFT_SCALE", "1") == "0") "{}"
      else BenchScale.run(spark, sfDir, timeoutSec)
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
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cold":$qsCold,"scale":$scale,"cluster":$cluster,"sf":"$sfDir"}"""
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
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},""" +
      s""""failed":${failed.mkString("[\"", "\",\"", "\"]").replace("[\"\"]", "[]")},""" +
      s""""queries":${picked.mkString("{", ",", "}")},""" +
      s""""full":"bench_out.json","sf":"$sfDir"}"""
    try spark.stop() catch { case scala.util.control.NonFatal(_) => () }
    println(compact)
  }
}
