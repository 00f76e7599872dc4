package graft

import org.apache.spark.sql.SparkSession

/** Phase-attribution harness for the s2-style DSv2 micro-query drift:
  * separates state-store load, DSv2 relation resolution, planning
  * (executedPlan), and execution for the lifecycle table.
  */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").count()

    // warm-build the fixture once via the query itself
    SparkEntry.queries("s2_dsv2_pushdown")(spark, sfDir).count()
    // the fixture dir is cached; recover it by reflection-free re-call:
    // time phases explicitly
    (1 to reps).foreach { _ =>
      def t[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
      }
      val (df, tQ) = t(SparkEntry.queries("s2_dsv2_pushdown")(spark, sfDir))
      val (_, tPlan) = t(df.queryExecution.executedPlan)
      val (_, tExec) = t(df.count())
      println(f"PHASES build=$tQ%.3f plan=$tPlan%.3f exec=$tExec%.3f")
    }
    spark.stop()
  }
}
