package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.core.{GraftField, GraftSchema}
import graft.table.{GraftTable, TableConfig}

/** Scale-stress section of the bench (verdict r3 #9): the engine
  * dataflows — ingest, whole-table compaction merge, and the DSv2 scan
  * both BEFORE compaction (row-based N-way merge) and AFTER (vectorized
  * single-file fast path) — run on synthetically ×10 lineitem, and the
  * quadratic dedup operators on a ×3 corpus. Reported as rows/s so the
  * BASELINE comparison (ingest 150–250k rows/s/job, Java compaction
  * 170–400k rows/s, DataFusion 2.9–4.5M rows/s) is made at a size where
  * Spark's fixed per-query overhead doesn't dominate.
  *
  * The ×10 copies shift l_orderkey by i·(max key + 1) so the key space
  * stays contiguous and the 32-way split tree stays balanced at every
  * scale factor.
  */
object BenchScale {

  private val EngineFactor = 10
  private val CorpusFactor = 3

  /** Whole-section repeat with per-row min-merge (best-of-N like the
    * query section's best-of-two): each pass rebuilds its own tables in
    * fresh temp dirs, so re-running the stateful engine sequence is
    * safe, and the reported number is the steady-state one instead of
    * whichever machine-noise draw a single pass landed on. The `_sec`
    * and `_rows_per_s` of a row always come from the SAME (fastest)
    * pass.
    */
  def run(spark: SparkSession, sfDir: String, timeoutSec: Long): String = {
    val repeats = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPEAT", "2").toInt.max(1)
    val passes = (1 to repeats).map(p => runOnce(spark, sfDir, timeoutSec, p))
    val merged = scala.collection.mutable.LinkedHashMap[String, Double]()
    // rows may be once-per-run (firstPassOnly), so guard on key presence
    passes.head.keys.filter(_.endsWith("_sec")).foreach { secKey =>
      val rateKey = secKey.stripSuffix("_sec") + "_rows_per_s"
      val best = passes.filter(p => p.contains(secKey) && p(secKey) >= 0)
        .sortBy(_(secKey)).headOption
      merged(secKey) = best.map(_(secKey)).getOrElse(-1)
      merged(rateKey) = best.map(_(rateKey)).getOrElse(-1)
    }
    // non-timing metrics (index footprints etc.) pass through from the
    // first pass that carries them
    passes.flatten.foreach { case (k, v) =>
      if (!k.endsWith("_sec") && !k.endsWith("_rows_per_s") && !merged.contains(k))
        merged(k) = v
    }
    merged.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
  }

  private def runOnce(spark: SparkSession, sfDir: String,
      timeoutSec: Long, pass: Int): scala.collection.mutable.LinkedHashMap[String, Double] = {
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    /** Best-of-`innerRepeats` within the pass: sub-second rows (the
      * DSv2 scans) are JIT/GC-noise-bound at best-of-passes granularity
      * — r7 booked a -43% "regression" on a 0.145s absolute delta —
      * so cheap rows re-measure inside the pass and report the min.
      */
    def timed(name: String, rows: => Long, innerRepeats: Int = 1,
        timeoutMult: Long = 1)(body: => Unit): Unit = {
      var bestSec = Double.MaxValue
      var ok = true
      var i = 0
      while (i < innerRepeats && ok) {
        val t0 = System.nanoTime()
        ok = Verify.runBounded(spark, s"scale_$name", timeoutSec * timeoutMult) { body }
        val sec = (System.nanoTime() - t0) / 1e9
        if (ok) bestSec = math.min(bestSec, sec)
        i += 1
      }
      results(s"${name}_sec") = if (ok) math.rint(bestSec * 1000) / 1000 else -1
      results(s"${name}_rows_per_s") =
        if (ok && bestSec > 0) math.rint(rows / bestSec) else -1
    }

    // -- engine dataflows on x10 lineitem ------------------------------
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").cast("long").as("qty"))
    // derive the copy shift from the DATA (max key + 1), so copies never
    // overlap and the split tree stays balanced at every scale factor
    val shift = li.agg(max("l_orderkey")).head().getLong(0) + 1
    val keySpan = shift * EngineFactor
    val scaled = (0 until EngineFactor).map(i =>
        li.select((col("l_orderkey") + lit(i * shift)).as("l_orderkey"),
          col("l_linenumber"), col("qty")))
      .reduce(_ unionByName _)
    val totalRows = li.count() * EngineFactor

    val schema = GraftSchema(
      rowKeys = Seq(GraftField("l_orderkey", LongType)),
      sortKeys = Nil,
      values = Seq(GraftField("qty", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-scale").toString
    val splits = (1 until 32).map(i => i * keySpan / 32)
    // No continual aggregation: the compaction is then a PURE sorted
    // merge (the o1/BASELINE-compaction analog) and the pre/post DSv2
    // scans read the same row count — a clean vectorized-vs-merge delta.
    val table = GraftTable.create(spark, dir, schema, splitPoints = splits,
      config = TableConfig(gcDelayMinutes = 0))

    timed("ingest_x10", totalRows) {
      // two interleaved halves so every leaf holds 2 overlapping runs
      table.ingest(scaled.filter(col("l_linenumber") <= 2).drop("l_linenumber"))
      table.ingest(scaled.filter(col("l_linenumber") >= 3).drop("l_linenumber"))
    }
    // the qty >= 0 residual filter blocks the metadata SUM answer, so
    // these rows keep measuring the SCAN (merge path / vectorized path);
    // the metadata answer itself is priced by sum_pushdown_x10 below
    timed("dsv2_merge_scan_x10", totalRows, innerRepeats = 3) {
      spark.read.format("graft").load(dir)
        .filter(col("qty") >= 0).agg(sum("qty")).collect()
    }
    timed("compact_x10", totalRows) { table.compactAll() }
    timed("dsv2_vector_scan_x10", totalRows, innerRepeats = 3) {
      spark.read.format("graft").load(dir)
        .filter(col("qty") >= 0).agg(sum("qty")).collect()
    }
    // unfiltered SUM/COUNT: zero data files read (sidecar stats)
    timed("sum_pushdown_x10", totalRows, innerRepeats = 3) {
      spark.read.format("graft").load(dir).agg(sum("qty"), count(lit(1))).collect()
    }
    // Point lookup on the compacted x10 table (the reference's headline
    // ~0.5s use case): leaf pruning + 8MB-row-group/128KB-page layout
    // means one leaf, a few pages per column. Report seconds per lookup
    // (rows/s is meaningless here).
    timed("point_lookup_x10", 1) {
      val key = shift * (EngineFactor / 2) + 42
      spark.read.format("graft").load(dir)
        .filter(col("l_orderkey") === key).collect()
    }

    // -- salt=1 control (verdict r8 #5): the same ingest+merge+compact
    // sequence with leaf salting disabled, so the parallel-sorted-runs
    // trade (faster ingest, more files for the downstream merge) is a
    // measured delta, not a guess. Once per run.
    if (pass == 1) {
      val dirC = java.nio.file.Files.createTempDirectory("graft-bench-salt1").toString
      val tableC = GraftTable.create(spark, dirC, schema, splitPoints = splits,
        config = TableConfig(gcDelayMinutes = 0))
      System.setProperty("graft.ingest.max.salt", "1")
      try {
        timed("ingest_x10_salt1", totalRows) {
          tableC.ingest(scaled.filter(col("l_linenumber") <= 2).drop("l_linenumber"))
          tableC.ingest(scaled.filter(col("l_linenumber") >= 3).drop("l_linenumber"))
        }
      } finally System.clearProperty("graft.ingest.max.salt")
      timed("dsv2_merge_scan_x10_salt1", totalRows, innerRepeats = 3) {
        spark.read.format("graft").load(dirC)
          .filter(col("qty") >= 0).agg(sum("qty")).collect()
      }
      timed("compact_x10_salt1", totalRows) { tableC.compactAll() }
      graft.meta.GraftFS.deleteRecursive(dirC)
    }

    // -- co-partitioned merge join vs shuffle join (j7 at scale) -------
    // A second table over the SAME split points (one row per distinct
    // key), then the same join priced both ways: coJoin streams the
    // leaf-aligned sorted merges (zero shuffle of either side), the
    // control reads both tables through DSv2 and runs Spark's
    // sort-merge join (both sides exchange on the key). The broadcast
    // hint is forced OFF in the control because that is the 100-TB
    // shape — at bench scale the right side would fit a broadcast, at
    // target scale neither side does. Once per run.
    if (pass == 1) {
      val dirR = java.nio.file.Files.createTempDirectory("graft-bench-cojoin").toString
      val rSchema = GraftSchema(
        rowKeys = Seq(GraftField("k", LongType)),
        sortKeys = Nil,
        values = Seq(GraftField("rv", LongType)))
      val rTable = GraftTable.create(spark, dirR, rSchema, splitPoints = splits,
        config = TableConfig(gcDelayMinutes = 0))
      rTable.ingest(scaled.select(col("l_orderkey").as("k")).distinct()
        .withColumn("rv", col("k") % 1000))
      rTable.compactAll()
      timed("cojoin_x10", totalRows, innerRepeats = 3) {
        table.coJoin(rTable)
          .agg(sum(col("qty") * col("rv"))).collect()
      }
      timed("shuffle_join_x10", totalRows, innerRepeats = 3) {
        val l = spark.read.format("graft").load(dir)
        val r = spark.read.format("graft").load(dirR).hint("shuffle_merge")
        l.join(r, l("l_orderkey") === r("k"))
          .agg(sum(l("qty") * r("rv"))).collect()
      }
      graft.meta.GraftFS.deleteRecursive(dirR)
    }

    // -- bloom value-index skipping priced at scale (p9) ---------------
    // x10 rows in 8 ingest batches, each batch carrying a 2-tag set
    // whose RANGE straddles the probe tag (min/max stats keep every
    // file) while the SET discriminates (the bloom prunes 7/8 of each
    // leaf's files). The control runs the SAME equality on an identical
    // unindexed column of the same table, so the delta is purely the
    // per-file bloom probe. Once per run.
    if (pass == 1) {
      val dirB = java.nio.file.Files.createTempDirectory("graft-bench-bloom").toString
      val bSchema = GraftSchema(
        rowKeys = Seq(GraftField("l_orderkey", LongType)),
        sortKeys = Nil,
        values = Seq(
          GraftField("tag", org.apache.spark.sql.types.StringType),
          GraftField("tag2", org.apache.spark.sql.types.StringType)))
      val bTable = GraftTable.create(spark, dirB, bSchema, splitPoints = splits,
        config = TableConfig(gcDelayMinutes = 0, indexConfig = "bloom(tag)"))
      val groups = 8
      (0 until groups).foreach { g =>
        val lo = f"tag$g%02d"
        val hi = f"tag${63 - g}%02d"
        // the lo/hi choice must NOT correlate with the batch's key
        // residue (k % groups == g), or each file would carry a single
        // tag and min/max stats would prune instead of the bloom —
        // alternate on (k DIV groups) so every file holds both tags
        bTable.ingest(scaled.filter(col("l_orderkey") % groups === g)
          .select(col("l_orderkey"),
            expr(s"CASE WHEN (l_orderkey DIV $groups) % 2 = 0 " +
              s"THEN '$lo' ELSE '$hi' END").as("tag"))
          .withColumn("tag2", col("tag")))
      }
      timed("bloom_skip_x10", totalRows, innerRepeats = 3) {
        spark.read.format("graft").load(dirB)
          .filter(col("tag") === "tag07").agg(count(lit(1))).collect()
      }
      timed("bloom_skip_x10_control", totalRows, innerRepeats = 3) {
        spark.read.format("graft").load(dirB)
          .filter(col("tag2") === "tag07").agg(count(lit(1))).collect()
      }
      // at bench scale both rows are fixed-overhead-bound (the corpus
      // fits the page cache), so record the IO-side evidence too: files
      // pruned of files total — the ratio that becomes the win at 100 TB
      val bdf = spark.read.format("graft").load(dirB).filter(col("tag") === "tag07")
      bdf.agg(count(lit(1))).collect()
      val bdesc = bdf.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.description()
      }.headOption.getOrElse("")
      results("bloom_skip_x10_files_pruned") =
        "bloomSkippedFiles=(\\d+)".r.findFirstMatchIn(bdesc)
          .map(_.group(1).toDouble).getOrElse(-1.0)
      results("bloom_skip_x10_files_total") =
        bTable.store.fileReferences.size.toDouble
      graft.meta.GraftFS.deleteRecursive(dirB)
    }

    // -- row-key deletes priced at scale (m13) -------------------------
    // A 1000-key takedown against the compacted x10 table: the
    // tombstone registration (delete_x10: O(keys) — one key shuffle +
    // state commit, NO data IO), a read with the anti-merge applied
    // (delete_read_x10), and the physical purge (delete_purge_x10: the
    // whole-table compaction that also retires the tombstones). Prices
    // the claim that a takedown costs metadata now and one normal
    // compaction later. Once per run, LAST (it rewrites `table`).
    if (pass == 1) {
      val delKeys = spark.range(1000)
        .select((col("id") * (keySpan / 1000)).as("l_orderkey"))
      timed("delete_x10", 1000) {
        table.deleteKeys(delKeys)
      }
      timed("delete_read_x10", totalRows) {
        spark.read.format("graft").load(dir)
          .filter(col("qty") >= 0).agg(sum("qty")).collect()
      }
      timed("delete_purge_x10", totalRows) { table.compactAll() }
      // deep clone of the compacted x10 table: one executor-parallel
      // byte-copy pass + an O(1) initial snapshot — prices the
      // branch-for-experiments path (no shuffle, no re-sort, no sketch
      // rebuild; the cost IS storage bandwidth)
      val cloneDir = java.nio.file.Files.createTempDirectory("graft-bench-clone").toString
      timed("clone_x10", totalRows) {
        val v = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
        table.cloneAt(s"$cloneDir/t", v)
      }
      // replication: the initial logical-snapshot cycle moves the whole
      // x10 table (CDC read + one merge write), then an incremental
      // cycle moves only a 1/32nd update window — the O(changed files)
      // claim, priced
      val replDir = java.nio.file.Files.createTempDirectory("graft-bench-repl").toString
      val replica = GraftTable.create(spark, s"$replDir/t", schema,
        splitPoints = splits, config = TableConfig(gcDelayMinutes = 0))
      val repl = new graft.jobs.Replication(table, replica)
      timed("replicate_x10", totalRows) { repl.runOnce() }
      val window = totalRows / 32
      table.ingest(scaled.filter(col("l_linenumber") === 1)
        .drop("l_linenumber").limit(window.toInt))
      timed("replicate_inc_x10", window) { repl.runOnce() }
    }

    // -- z-order layout: pruned box query vs full-scan control ---------
    // The p6 capability priced at scale: an x10 events table keyed by
    // the (user_id, day) Morton code, 32 leaves at z quantiles. The box
    // query decomposes into z ranges and rides the leaf-pruned region
    // scan; the control answers the SAME box from the same table with
    // an unbounded region (full scan + residual filter). The gap is the
    // multi-dimensional pruning win — the number that grows with table
    // size while the pruned cost tracks box volume.
    if (pass == 1) {
      val ev = Tables(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), expr("ts DIV 86400000000000").as("day"))
      val userSpan = ev.agg(max("user_id")).head().getLong(0) + 1
      val evScaled = (0 until EngineFactor).map(i =>
          ev.select(col("event_id"), (col("user_id") + lit(i * userSpan)).as("user_id"),
            col("day")))
        .reduce(_ unionByName _)
        .select(graft.core.ZOrder.zvalue(col("user_id"), col("day")).as("z"),
          col("event_id"), col("user_id"), col("day"))
      val evRows = ev.count() * EngineFactor
      val zSchema = GraftSchema(
        rowKeys = Seq(GraftField("z", LongType)),
        sortKeys = Seq(GraftField("event_id", LongType)),
        values = Seq(GraftField("user_id", LongType), GraftField("day", LongType)))
      val zSplits = evScaled.agg(expr(
          "percentile(z, array(" + (1 until 32).map(_ / 32.0).mkString(",") + "))"))
        .head().getSeq[Double](0).map(_.toLong).distinct.sorted
      val zDir = java.nio.file.Files.createTempDirectory("graft-bench-zorder").toString
      val zTable = GraftTable.create(spark, zDir, zSchema, splitPoints = zSplits,
        config = TableConfig(gcDelayMinutes = 0))
      zTable.ingest(evScaled)
      zTable.compactAll()
      val (bx0, bx1, by0, by1) = (10L, 99L, 19730L, 19739L)
      def residual(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("user_id") >= bx0 && col("user_id") <= bx1 &&
          col("day") >= by0 && col("day") <= by1)
      val zr = graft.core.ZOrder.ranges(bx0, bx1, by0, by1, bits = 16, maxRanges = 32)
      val boxRegions = zr.map { case (lo, hi) =>
        graft.core.Region(graft.core.KeyRange.minMax("z", lo, hi + 1)) }
      timed("zorder_box_x10", evRows, innerRepeats = 3) {
        residual(zTable.query(graft.query.GraftQuery(regions = boxRegions))).count()
      }
      timed("zorder_fullscan_x10", evRows, innerRepeats = 3) {
        residual(zTable.query(graft.query.GraftQuery.all)).count()
      }
      // the structural pruning ratio — the number that scales with the
      // table while the timing delta at this sf is mostly fixed costs
      val zTree = zTable.store.partitionTree
      results("zorder_leaves_touched") = zTree.leavesOverlapping(boxRegions).size.toDouble
      results("zorder_leaves_total") = zTree.leaves.size.toDouble
      graft.meta.GraftFS.deleteRecursive(zDir)
    }

    // -- composed IVF-PQ index: build + serve + footprint --------------
    // Build is a once-per-corpus artifact (train coarse + residual
    // codebooks, one encode pass, partitioned write); serve is the
    // per-query cost of cell-pruned ADC + rerank. bytes/vec is the
    // physical list footprint over the vector count — the compression
    // the ADC scan actually enjoys (codes + raw vectors both live in
    // the lists; the approximate phase reads only the m-byte codes).
    if (pass == 1) {
      val emb = Tables(spark, sfDir, "embeddings")
      val embRows = emb.count()
      val idxDir = java.nio.file.Files.createTempDirectory("graft-bench-ivfpq").toString
      timed("ivfpq_build", embRows) {
        graft.vectors.VectorFunctions.buildIvfPqIndex(emb, "vec_id", "embedding",
          idxDir, nCentroids = 16, m = 16, ksub = 256)
      }
      val qdf = emb.filter(col("vec_id") === 13)
      timed("ivfpq_serve", embRows, innerRepeats = 3) {
        graft.vectors.VectorFunctions.knnIvfPqIndex(spark, idxDir, qdf, "embedding",
          k = 10, nprobe = 12, rerank = 64).collect()
      }
      val (bytes, n) = graft.vectors.VectorFunctions.ivfPqIndexBytes(spark, idxDir)
      if (n > 0) results("ivfpq_index_bytes_per_vec") = math.rint(bytes * 100.0 / n) / 100
      graft.meta.GraftFS.deleteRecursive(idxDir)
    }

    // -- mutable index: table-fed build, 10% delete, CDC sync, vacuum --
    // The DELETE/UPSERT consistency loop priced at corpus scale: sync
    // cost must track CHANGED rows (never the corpus), the tombstone
    // anti-join must not move the serve time, and vacuum is the
    // once-in-a-while physical rewrite.
    if (pass == 1) {
      val emb = Tables(spark, sfDir, "embeddings")
      val embRows = emb.count()
      val base = java.nio.file.Files.createTempDirectory("graft-bench-ivfsync").toString
      val vSchema = GraftSchema(
        rowKeys = Seq(GraftField("vec_id", LongType)),
        sortKeys = Nil,
        values = Seq(GraftField("embedding", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
      val vt = GraftTable.create(spark, s"$base/t", vSchema,
        config = TableConfig(gcDelayMinutes = 0))
      vt.ingest(emb.select(col("vec_id"), col("embedding")))
      timed("ivf_table_build", embRows) {
        graft.vectors.VectorFunctions.buildIvfIndexFromTable(
          vt, "vec_id", "embedding", s"$base/i", nCentroids = 16)
      }
      vt.deleteKeys(emb.filter(pmod(col("vec_id"), lit(10)) === 3).select("vec_id"))
      val changed = embRows / 10
      timed("ivf_sync_delta", changed) {
        graft.vectors.VectorFunctions.syncIndexWithTable(
          vt, "vec_id", "embedding", s"$base/i")
      }
      val qdf = emb.filter(col("vec_id") === 13)
      timed("ivf_tombstone_serve", embRows, innerRepeats = 3) {
        graft.vectors.VectorFunctions.knnIvfIndex(spark, s"$base/i", qdf,
          "embedding", k = 10, nprobe = 4).collect()
      }
      timed("ivf_vacuum", embRows) {
        graft.vectors.VectorFunctions.vacuumIndex(spark, s"$base/i")
      }
      graft.meta.GraftFS.deleteRecursive(base)
    }

    // -- quadratic dedup operators on a x3 corpus ----------------------
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val docs3 = (0 until CorpusFactor).map(i =>
        docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val docRows = docs.count() * CorpusFactor
    timed("d2_ngram_x3", docRows) {
      graft.dedup.Dedup.ngramJaccardPairs(docs3, "doc_id", "text",
        n = 2, threshold = 0.5).count()
    }
    timed("d3_minhash_x3", docRows) {
      graft.dedup.Dedup.minhashLshPairs(docs3, "doc_id", "text",
        n = 2, threshold = 0.5).count()
    }
    timed("d4_simhash_x3", docRows) {
      graft.dedup.Dedup.simhashPairs(docs3, "doc_id", "text", maxHamming = 3).count()
    }
    // bloom-gated incremental dedup: odd ids deduped against even ids —
    // the probe side is ~half the ×3 corpus, all of it map-only except
    // the (tiny) probe-hit confirm join
    timed("d6_bloom_x3", docRows / 2) {
      graft.dedup.Dedup.bloomDedup(
        docs3.filter(pmod(col("doc_id"), lit(2)) === 1),
        docs3.filter(pmod(col("doc_id"), lit(2)) === 0),
        "text").count()
    }
    // repetition signals: one-pass codegen expression, the pure map-side
    // throughput number for the curation-signal family
    timed("t8_repetition_x3", docRows) {
      docs3.select(col("doc_id"),
        graft.text.TextFunctions.topNgramFraction(col("text"), 2),
        graft.text.TextFunctions.topNgramFraction(col("text"), 3)).count()
    }

    // -- true sf1 row: heavy hitters over MATERIALIZED parquet ---------
    // The ×10 sections above stream an in-memory union; this one writes
    // the scaled lineitem to parquet FIRST (sf0.1 × 10 ≈ sf1: ~6M rows),
    // then runs the heavy-hitter driver queries end-to-end — parquet
    // scan included — exactly as they run at sf0.1, so the rows/s here
    // is a whole-pipeline number against the compaction baseline, not a
    // cached-input one. SPARK_GRAFT_SF1=0 skips it.
    if (sys.env.getOrElse("SPARK_GRAFT_SF1", "1") == "1") {
      val liFull = Tables(spark, sfDir, "lineitem")
      val sf1Dir = java.nio.file.Files.createTempDirectory("graft-sf1").toString
      val scaledFull = (0 until EngineFactor).map(i =>
          liFull.withColumn("l_orderkey", col("l_orderkey") + lit(i * shift)))
        .reduce(_ unionByName _)
      timed("sf1_materialize", totalRows) {
        scaledFull.write.parquet(s"$sf1Dir/lineitem.parquet")
      }
      Seq("o1_sorted_merge", "x3_agg_dsl", "m1_compaction_merge", "m2_lifecycle")
        .foreach { q =>
          timed(s"sf1_$q", totalRows) { SparkEntry.queries(q)(spark, sf1Dir).count(): Unit }
        }

      // The dedup family over a MATERIALIZED ×10 documents corpus
      // (sf0.1 × 10 ≈ 50k docs — the sf1 shape): every copy keeps its
      // full text, so the near-dup graph really does densify ~100× in
      // pair count (each base cluster of c docs becomes 10c) — this is
      // what pushes d5 past its 1M-edge driver union-find cap into the
      // distributed pointer-jumping path at true sf1.
      val docsF = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
      val docs10 = (0 until EngineFactor).map(i =>
          docsF.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
        .reduce(_ unionByName _)
      val docRows10 = docsF.count() * EngineFactor
      timed("sf1_docs_materialize", docRows10) {
        docs10.write.parquet(s"$sf1Dir/documents.parquet")
      }
      val docsSf1 = spark.read.parquet(s"$sf1Dir/documents.parquet")
      timed("sf1_d2_ngram", docRows10) {
        graft.dedup.Dedup.ngramJaccardPairs(docsSf1, "doc_id", "text",
          n = 2, threshold = 0.5).count()
      }
      timed("sf1_d3_minhash", docRows10) {
        graft.dedup.Dedup.minhashLshPairs(docsSf1, "doc_id", "text",
          n = 2, threshold = 0.5).count()
      }
      timed("sf1_d5_cluster", docRows10) {
        graft.dedup.Dedup.neardupDedup(docsSf1, "doc_id", "text",
          n = 2, threshold = 0.5).count()
      }
      timed("sf1_d6_bloom", docRows10 / 2) {
        graft.dedup.Dedup.bloomDedup(
          docsSf1.filter(pmod(col("doc_id"), lit(2)) === 1),
          docsSf1.filter(pmod(col("doc_id"), lit(2)) === 0),
          "text").count()
      }
      // the curation family at the same scale: BPE counting (pure
      // map-side codegen), bigram-LM scoring and duplicated-span
      // detection (model agg + hot-split join each)
      timed("sf1_t14_bpe", docRows10) {
        docsSf1.agg(sum(graft.functions.BpeExpressions
          .bpe_token_count(col("text"), graft.text.Bpe.corpusMerges))).collect()
      }
      timed("sf1_t15_lm", docRows10) {
        graft.text.CorpusScoring.lmBigramScore(docsSf1, "doc_id", "text").count()
      }
      timed("sf1_t16_spans", docRows10) {
        graft.text.CorpusScoring.duplicateSpans(docsSf1, "doc_id", "text").count()
      }
      // perplexity bucketing = the t15 LM pipeline + the distributed
      // two-phase NTILE rank (GlobalRank) — the delta over sf1_t15_lm
      // prices the rank machinery at corpus scale
      timed("sf1_t21_buckets", docRows10) {
        graft.text.CorpusScoring.perplexityBuckets(docsSf1, "doc_id", "text").count()
      }
      // DSIR selection: two corpus scans (shared model agg + broadcast
      // scoring) and the distributed rank
      timed("sf1_t25_dsir", docRows10) {
        graft.text.ImportanceSampling.dsirSelect(docsSf1, "doc_id", "text",
          pmod(col("doc_id"), lit(3)) === 0, k = 1000).count()
      }
      // inverted index: build = the one-time corpus scan + postings
      // ingest; search = key point-lookups + Okapi top-k, priced
      // separately (corpus docs / serve-second)
      val idxDir = s"$sf1Dir/searchidx$pass"
      timed("sf1_t26_index_build", docRows10) {
        graft.text.SearchIndex.build(docsSf1, "doc_id", "text", idxDir)
      }
      timed("sf1_t26_search", docRows10, innerRepeats = 3) {
        graft.text.SearchIndex.searchBm25(spark, idxDir,
          Seq("spark", "merge", "window"), k = 20).count()
      }

      // -- d5 on the distributed component path (verdict r7 #5) --------
      // The ×10 corpus keeps exact clones, which the pre-LSH exact
      // collapse folds away. This row makes every copy a NEAR-dup
      // instead (a per-copy suffix token): the base corpus's ~270-doc
      // families become ~8,100-member cliques, whose ALL-PAIRS
      // candidate volume (Σk² ≈ 1.9e9) used to fill the disk — the
      // exact blowup minhashLshEdges's star mode exists for; it keeps
      // the edge graph LINEAR (~255k edges), so driverLimit=0 forces
      // the DISTRIBUTED pointer-jumping fixpoint that a 100-TB graph
      // would take (components() logs which path ran on stderr).
      // Expensive by design → once per bench run, not per pass.
      if (pass == 1) {
        // Drop every cached block accumulated by the 92 query rows and
        // the scale passes before this (deliberately) biggest row: the
        // ×30 pipeline persists multi-GB relations, and with the
        // session's storage memory already full of stale blocks the row
        // pays eviction+GC churn instead of its own work — measured
        // 19-37s standalone vs 64-124s late in a full bench run.
        spark.sqlContext.clearCache()
        val NearFactor = 30
        val docs30 = (0 until NearFactor).map(i =>
            docsF.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
              concat(col("text"), lit(s" dupcopy$i")).as("text")))
          .reduce(_ unionByName _)
        val docRows30 = docsF.count() * NearFactor
        docs30.write.parquet(s"$sf1Dir/documents30.parquet") // corpus prep, not timed
        val d30 = spark.read.parquet(s"$sf1Dir/documents30.parquet")
        // once per run and deliberately past the driver cutover: give
        // it the long-row budget rather than the per-query one
        // best-of-2: this row's single-shot numbers swung 33-92s with
        // OS cache state across otherwise-idle runs; the min of two
        // consecutive runs is the steady-state figure worth trending
        timed("sf1x10_d5_cluster", docRows30, innerRepeats = 2, timeoutMult = 3) {
          graft.dedup.Dedup.neardupDedup(d30, "doc_id", "text",
            n = 2, threshold = 0.5, driverLimit = 0).count()
        }
      }
      graft.meta.GraftFS.deleteRecursive(sf1Dir)
    }

    // -- endurance: full lifecycle at ×SPARK_GRAFT_ENDURE (default 100,
    // ~6e7 lineitem rows at sf0.1; 0 disables) — the memory/spill shape
    // the ×10 rows never reach. One pass only; copies come from a
    // broadcast range cross-join (single scan, flat plan — a 100-way
    // union would blow up analysis time), keys stay disjoint per copy.
    val endureFactor = sys.env.getOrElse("SPARK_GRAFT_ENDURE", "100").toInt
    if (pass == 1 && endureFactor > 0) {
      val f = endureFactor
      val copies = li.crossJoin(broadcast(spark.range(f).toDF("__copy")))
        .select((col("l_orderkey") + col("__copy") * shift).as("l_orderkey"),
          col("l_linenumber"), col("qty"))
      val rowsF = li.count() * f
      val span = shift * f
      val edir = java.nio.file.Files.createTempDirectory("graft-endure").toString
      val esplits = (1 until 64).map(i => i * span / 64)
      val etable = GraftTable.create(spark, edir, schema, splitPoints = esplits,
        config = TableConfig(gcDelayMinutes = 0))
      timed(s"endure_x${f}_ingest", rowsF, timeoutMult = 10) {
        etable.ingest(copies.filter(col("l_linenumber") <= 2).drop("l_linenumber"))
        etable.ingest(copies.filter(col("l_linenumber") >= 3).drop("l_linenumber"))
      }
      timed(s"endure_x${f}_compact", rowsF, timeoutMult = 10) { etable.compactAll() }
      timed(s"endure_x${f}_scan", rowsF, timeoutMult = 10) {
        spark.read.format("graft").load(edir)
          .filter(col("qty") >= 0).agg(sum("qty")).collect()
      }
      timed(s"endure_x${f}_lookup", 1) {
        etable.lookup(span / 2 + 1).collect()
      }
      graft.meta.GraftFS.deleteRecursive(edir)
    }

    // -- micro-batch ingest on a many-leaf table (small-files guard) ---
    // 20 tiny batches, each spanning all 128 leaves: the per-leaf layout
    // would write ~128 near-empty files PER BATCH; the small-batch path
    // writes ONE shared root-homed file per batch (files_per_batch = 1).
    if (pass == 1) {
      val mdir = java.nio.file.Files.createTempDirectory("graft-bench-micro").toString
      val msplits = (1 until 128).map(i => i * keySpan / 128)
      val mtable = GraftTable.create(spark, mdir, schema, splitPoints = msplits,
        config = TableConfig(gcDelayMinutes = 0))
      val batches = 20
      val rowsPer = 500
      timed("micro_ingest_x20", batches.toLong * rowsPer) {
        var b = 0
        while (b < batches) {
          mtable.ingest(spark.range(0, rowsPer)
            .select((col("id") * lit(keySpan / rowsPer) + lit(b)).as("l_orderkey"),
              col("id").as("qty")))
          b += 1
        }
      }
      results("micro_ingest_files_per_batch") =
        mtable.store.fileReferences.map(_.filename).distinct.size.toDouble / batches
      graft.meta.GraftFS.deleteRecursive(mdir)
    }

    // -- state-store commit throughput: serial vs batched committer ----
    // Metadata-only (no data files): 8 concurrent writers landing 800
    // commits against one durable log. The serial path pays one CAS
    // publish per commit; the batched committer folds whole queues into
    // composite versions. On local fs the publish is ~ms, so the local
    // ratio UNDERSTATES the object-store gain (where a conditional put
    // is ~10ms and serial tops out near 100 commits/s regardless of
    // writer count).
    if (pass == 1) {
      import graft.meta.{CommitterQueue, CommitOutcome, ConcurrentStateException,
        FileReference, JsonStateStore, StateTransaction}
      val nCommits = 800
      val threads = 8
      def commitStore() = JsonStateStore.create(
        java.nio.file.Files.createTempDirectory("graft-bench-commit").toString,
        schema, graft.core.PartitionTree.fromSplitPoints(schema, Nil))
      def hammer(body: Int => Unit): Unit = {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        try {
          val fs = (0 until nCommits).map(i =>
            pool.submit(new java.util.concurrent.Callable[Unit] {
              def call(): Unit = body(i)
            }))
          fs.foreach(_.get())
        } finally pool.shutdown()
      }
      val s1 = commitStore()
      val leaf1 = s1.partitionTree.leaves.head.id
      timed("commit_serial", nCommits) {
        hammer { i =>
          var done = false
          while (!done) {
            try { s1.addFiles(Seq(FileReference(s"s-$i", leaf1, 1))); done = true }
            catch { case _: ConcurrentStateException => () }
          }
        }
      }
      val s2 = commitStore()
      val leaf2 = s2.partitionTree.leaves.head.id
      timed("commit_batched", nCommits) {
        val q = new CommitterQueue(s2, maxBatch = 64)
        try hammer { i =>
          var done = false
          while (!done) q.submit(StateTransaction.AddFiles(
              Vector(FileReference(s"b-$i", leaf2, 1)))) match {
            case CommitOutcome.Failed(_: ConcurrentStateException) => ()
            case CommitOutcome.Failed(e) => throw e
            case _ => done = true
          }
        } finally q.close()
      }
      results("commit_batched_versions") = s2.currentVersion.toDouble
    }

    results
  }
}
