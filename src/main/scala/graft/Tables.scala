package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access. Tables are the driver-generated TPC-H-ish parquet
  * files (see TESTDATA.md). All graft queries read through here so the
  * scan path (pushdown, pruning) is uniform.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS); Spark 4 only reads it as a
    // long (epoch-nanos) via this legacy conf — otherwise the scan throws
    // PARQUET_TYPE_ILLEGAL. Set defensively for any caller's session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view for spark.sql superset queries. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
