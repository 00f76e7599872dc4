package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materializes a ×`factor` scale-up of a testdata sf directory for the
  * full-corpus oracle sweep (VERDICT r10 #3: correctness gated at
  * sf0.01 with spot checks is not a sweep; larger corpora find real
  * parameter pins — round 10's own sf0.1 sweep caught three).
  *
  * Fact tables scale by unioning key-shifted copies (orderkey shifts
  * identically in lineitem AND orders so the join surface stays
  * referentially consistent; doc/vec/event ids shift disjointly);
  * dimension tables copy through unchanged. The data needs no
  * semantic beauty — the oracle compare runs Spark and DuckDB over the
  * SAME parquet, so any deterministic corpus exercises every operator
  * at the target row count.
  *
  *   runMain graft.MakeScaledSf <srcSfDir> <destDir> [factor]
  */
object MakeScaledSf {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MakeScaledSf <srcSfDir> <destDir> [factor]")
    val Array(src, dest) = args.take(2)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-make-scaled-sf")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dest, factor)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dest: String, factor: Int): Unit = {
    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    // Write each table as a single FILE named <table>.parquet, exactly
    // like the driver's testdata layout — the streaming drains read
    // `readStream.parquet(sfDir)` with a filename glob, so a
    // directory-shaped table silently streams ZERO rows (caught by the
    // x10 sweep: every streaming row returned empty).
    def write(df: DataFrame, name: String): Unit = {
      val tmp = s"$dest/.tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet"))
        .head.getPath
      val target = new org.apache.hadoop.fs.Path(s"$dest/$name.parquet")
      fs.delete(target, true)
      require(fs.rename(part, target), s"rename $part -> $target failed")
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    def scaled(df: DataFrame, shifts: Map[String, Long],
        perturbText: Boolean = false): DataFrame =
      (0 until factor).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i * s)) }
        // Text perturbation for the near-dup family (VERDICT r12 #8):
        // an exact key-shifted COPY of every document makes each base
        // document near-identical to its N-1 copies, so all-pairs
        // oracles (n-gram Jaccard, minhash verify) go quadratic in the
        // factor (DuckDB needed >78 GB for d3 at x10). Prefixing every
        // word with a copy tag is an INJECTIVE per-copy transform:
        // within a copy, every pairwise shingle/Jaccard/minhash
        // relation of the base corpus is preserved EXACTLY (word sets
        // map 1:1), while across copies word sets are disjoint — zero
        // similarity. Cluster sizes stay at base-corpus scale (linear
        // in factor, never x-factor cliques), and the base corpus's own
        // planted near-dup pairs replicate into each copy as the
        // bounded known-pair set.
        if (!perturbText || i == 0) shifted
        else shifted.withColumn("text",
          array_join(transform(split(col("text"), " "),
            w => concat(lit(s"c${i}_"), w)), " "))
      }.reduce(_ unionByName _)

    // dims: unchanged (each scaled copy of the facts fans into them)
    Seq("region", "nation", "customer", "supplier", "part").foreach(n => write(t(n), n))
    val keyShift = 10000000L
    write(scaled(t("lineitem"), Map("l_orderkey" -> keyShift)), "lineitem")
    write(scaled(t("orders"), Map("o_orderkey" -> keyShift)), "orders")
    write(scaled(t("events"),
      Map("event_id" -> keyShift, "user_id" -> 1000000L)), "events")
    write(scaled(t("documents"), Map("doc_id" -> keyShift), perturbText = true),
      "documents")
    write(scaled(t("embeddings"), Map("vec_id" -> keyShift)), "embeddings")
    println(s"""{"dest":"$dest","factor":$factor}""")
  }
}
