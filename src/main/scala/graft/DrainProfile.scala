package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-batch drain profiler (measurement tool, not bench contract):
  * runs a representative stateful drain and prints each batch's
  * durationMs breakdown (addBatch, getBatch, queryPlanning, walCommit,
  * commitOffsets, triggerExecution) plus state-store commit times, so
  * the per-batch overhead has an attribution instead of a guess.
  */
object DrainProfile {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "calib"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("DRAIN_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("DRAIN_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("DRAIN_CHECKSUM", "true"))
      .config("spark.sql.streaming.checkpointFileManagerClass",
        sys.env.getOrElse("DRAIN_CFM",
          "org.apache.spark.sql.execution.streaming.checkpointing.FileContextBasedCheckpointFileManager"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ad-hoc session conf overrides for experiments: DRAIN_CONF="k=v;k=v"
    sys.env.get("DRAIN_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    spark.range(1000000).selectExpr("sum(id)").count()

    def dump(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
          s"getBatch=${d.get("getBatch")} latestOffset=${d.get("latestOffset")} " +
          s"plan=${d.get("queryPlanning")} wal=${d.get("walCommit")} " +
          s"commit=${d.get("commitOffsets")}")
        p.stateOperators.foreach { so =>
          println(s"  state op=${so.operatorName} commitMs=${so.allUpdatesTimeMs}/" +
            s"${so.commitTimeMs} mem=${so.memoryUsedBytes} rows=${so.numRowsTotal}")
        }
      }
    }

    // In-process sampling profiler over executor task threads: every
    // 20ms, record the top interesting frame of each running task
    // thread; print a histogram at the end.
    val hist = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val traces = Thread.getAllStackTraces
        traces.forEach { (t, frames) =>
          val n = t.getName
          if ((n.startsWith("Executor task launch worker") ||
               n.contains("stream execution thread") || n == "main") && frames.nonEmpty) {
            val tag = if (n.startsWith("Executor")) "EXEC"
              else if (n == "main") "DRIVER" else "STREAM"
            // driver stacks: skip the park/await prefix so the histogram
            // keys on WHAT is being awaited, not how parking is spelled
            val useful =
              if (tag == "DRIVER")
                frames.dropWhile(f => !f.getClassName.startsWith("org.apache.spark") &&
                  !f.getClassName.startsWith("graft"))
              else frames
            val key = tag + " " + useful.take(18).map(f => s"${f.getClassName}.${f.getMethodName}")
              .mkString(" <- ")
            hist.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong())
              .incrementAndGet()
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    def printHist(): Unit = {
      sampling = false
      import scala.jdk.CollectionConverters._
      val top = hist.asScala.toSeq.sortBy(-_._2.get).take(25)
      top.foreach { case (k, v) => println(s"SAMPLES ${v.get}  $k") }
    }

    mode match {
      case "calib" =>
        val base = if (args.length > 1) args(1) else "/tmp"
        val dir = s"$base/graft-drainprof-${java.util.UUID.randomUUID()}"
        try {
          spark.range(0, 5000L).select(col("id"), (col("id") % 7).as("g"))
            .write.mode("overwrite").parquet(s"$dir/in")
          println("files: " + new java.io.File(s"$dir/in").listFiles().count(_.getName.endsWith(".parquet")))
          val t0 = System.nanoTime()
          val q = spark.readStream.schema("id LONG, g LONG")
            .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
            .groupBy("g").count()
            .writeStream.format("memory").queryName("drainprof")
            .outputMode("complete")
            .option("checkpointLocation", s"$dir/ck").start()
          try { q.processAllAvailable() } finally q.stop()
          println(f"total ${(System.nanoTime() - t0) / 1e9}%.2f s")
          printHist()
          dump(q)
        } finally graft.meta.GraftFS.deleteRecursive(dir)
      case "t34" =>
        val t0 = System.nanoTime()
        val df = graft.streaming.StreamAnalytics.viewConversionJoin(spark, sfDir)
        df.count()
        println(f"t34 total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      case "t34x3" =>
        (1 to 3).foreach { _ =>
          val t0 = System.nanoTime()
          graft.streaming.StreamAnalytics.viewConversionJoin(spark, sfDir).count()
          println(f"t34 total ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      // profile any SparkEntry query: args = query <name[,name2,...]> [reps]
      case "query" =>
        val names = args(1).split(",")
        val reps = if (args.length > 2) args(2).toInt else 3
        val jobs = new java.util.concurrent.atomic.AtomicInteger()
        val stages = new java.util.concurrent.atomic.AtomicInteger()
        val tasks = new java.util.concurrent.atomic.AtomicInteger()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); ()
          }
          override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stages.incrementAndGet()
            tasks.addAndGet(s.stageInfo.numTasks); ()
          }
        })
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          (1 to reps).foreach { i =>
            jobs.set(0); stages.set(0); tasks.set(0)
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val dt = (System.nanoTime() - t0) / 1e9
            Thread.sleep(200) // let listener events drain
            println(f"$name run$i $dt%.2f s jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
          }
        }
        printHist()
      // write explain("formatted") for named queries:
      //   explain <outDir> <suffix> <q1,q2,...>
      case "explain" =>
        val outDir = args(1)
        val suffix = args(2)
        new java.io.File(outDir).mkdirs()
        args(3).split(",").foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          println(s"EXPLAIN $name -> $outDir/${name}_$suffix.txt")
        }
      // profile the BenchScale section (env SPARK_GRAFT_SF1/ENDURE gate rows)
      case "scale" =>
        val out = BenchScale.run(spark, sfDir, timeoutSec = 600)
        println("SCALE " + out)
        printHist()
    }
    spark.stop()
  }
}
