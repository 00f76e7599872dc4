package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Round-1 lesson: one hung query zeroed the entire round's signal
  * (sequential loop + oracle_sql.json written last). Now the oracle
  * JSON is written FIRST and every query runs under a watchdog that
  * cancels its Spark job group on timeout, so a single bad query can
  * only lose its own row.
  */
object Verify {

  private[graft] def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Run `body` bounded by `timeoutSec`; cancel the named job group and
    * return false on timeout or failure. On timeout the query's partial
    * output dir is deleted (a half-written parquet dir must not score),
    * and a worker stuck in non-interruptible code is reported — it may
    * keep using the shared session, which can distort later timings.
    */
  private[graft] def runBounded(spark: SparkSession, name: String, timeoutSec: Long,
      partialDir: Option[String] = None)(body: => Unit): Boolean = {
    val sc = spark.sparkContext
    val pool = Executors.newSingleThreadExecutor()
    val fut = pool.submit(new Runnable {
      def run(): Unit = {
        sc.setJobGroup(name, name, interruptOnCancel = true)
        body
      }
    })
    try { fut.get(timeoutSec, TimeUnit.SECONDS); true }
    catch {
      case _: TimeoutException =>
        System.err.println(s"[verify] $name TIMEOUT after ${timeoutSec}s — cancelling")
        sc.cancelJobGroup(name)
        fut.cancel(true)
        pool.shutdownNow()
        if (!pool.awaitTermination(10, TimeUnit.SECONDS))
          System.err.println(s"[verify] $name worker did not die (non-interruptible code); " +
            "zombie thread may still hold the session")
        partialDir.foreach { d =>
          val p = Paths.get(d)
          if (Files.exists(p)) {
            import scala.jdk.CollectionConverters._
            Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
          }
        }
        false
      case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getCause match {
          case null => e.getMessage; case c => c.getMessage }}")
        false
    } finally pool.shutdownNow()
  }

  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query names] — the optional
    // filter is a builder-side convenience for spot-checking single
    // rows at bigger SFs; the driver always passes two args.
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "60").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // Oracle SQL first: a partial query run must still score.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = runBounded(spark, name, timeoutSec, Some(s"$outDir/$name")) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[verify] $name%-28s ${if (ok) "ok" else "FAIL"}%-4s $secs%7.2fs")
    }
    spark.stop()
  }
}
