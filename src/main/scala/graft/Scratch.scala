package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness (not part of the bench contract): times the
  * named queries N times each against SPARK_GRAFT_SF_DIR and prints
  * per-run seconds, for root-causing individual bench rows.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args(0).split(",").toSeq else Seq("t14_bpe_stats")
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").count()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $n%s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
