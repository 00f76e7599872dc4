package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access. Tables are the driver-generated TPC-H-ish parquet
  * files (see TESTDATA.md). All graft queries read through here so the
  * scan path (pushdown, pruning) is uniform.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts may be parquet TIMESTAMP(NANOS); Spark 4 only reads that
    // as a long (epoch-nanos) via this legacy conf — otherwise the scan
    // throws PARQUET_TYPE_ILLEGAL. Set defensively for any caller's session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(spark, df) else df
  }

  /** The query surface reads `events.ts` as ONE representation: an
    * epoch-NANOS long. Depending on the generator, the parquet file
    * carries either TIMESTAMP(NANOS) — which the legacy conf above
    * already surfaces as that long — or TIMESTAMP(MICROS)/NTZ, which
    * this converts (µs × 1000). The NTZ wall time is the UTC instant the
    * generator wrote, so the cast is pinned to a UTC session zone; the
    * DuckDB oracle's `epoch_us(ts)` sees the identical microseconds.
    */
  private def normalizeEventTs(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType | TimestampNTZType =>
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(s"unsupported events.ts type $other")
    }
  }

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view for spark.sql superset queries. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
