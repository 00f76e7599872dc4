package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming analytics over a file stream: event-time windowed
  * aggregation with a watermark — the Structured-Streaming counterpart
  * of the batch rollups, showing the same engine tables feeding a
  * continuous query. The reference has no streaming analytics tier
  * (its streams stop at ingest); this is superset surface, built the
  * Spark-native way: `readStream` → event-time transforms →
  * windowed state → sink, with the watermark bounding state growth so
  * the query runs forever on an unbounded stream.
  *
  * `Trigger.AvailableNow` drains everything currently in the directory
  * and stops — the batch-verifiable harness mode; a deployment would
  * drop the trigger and let micro-batches run continuously. Windows are
  * epoch-aligned (UTC) and reported as epoch micros, so results carry
  * no session-timezone dependence.
  */
object StreamAnalytics {

  /** State-partition count for a drain. Every stateful operator
    * materializes its state stores once per shuffle partition per
    * micro-batch (a stream-stream join: four per partition), so the
    * batch-scan default buys pure filesystem churn on small streams —
    * but a pinned constant under-partitions a 100× stream. Adaptive:
    * input-bytes / 128 MB, floored at 8 (the harness corpus sweet
    * spot), capped at the session's shuffle parallelism; the explicit
    * `graft.streaming.statePartitions` conf overrides everything.
    * Partitioning is a throughput knob, never a semantics one.
    */
  private[streaming] def statePartitionsFor(spark: SparkSession, inputBytes: Long): Int =
    spark.conf.getOption("graft.streaming.statePartitions").map(_.toInt).getOrElse {
      val targetBytesPerPartition = 128L << 20
      val derived = math.ceil(inputBytes.toDouble / targetBytesPerPartition).toInt
      val cap = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
      math.max(8, math.min(derived, cap))
    }

  /** A drain-scoped session: `newSession()` shares the SparkContext
    * (executors, caches) but isolates SQL conf and temp views, so the
    * per-drain settings (state partitioning, nanos parquet reads, UTC
    * event time) never leak into — or race with — concurrent queries
    * on the caller's session (two nested drains previously could
    * restore the wrong global value). Each entry point builds its
    * stream AND reads its memory sink through this session.
    */
  private def drainSession(spark: SparkSession, sfDir: String, file: String): SparkSession = {
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scoped.conf.set("spark.sql.session.timeZone", "UTC")
    val bytes = new java.io.File(s"$sfDir/$file").length()
    scoped.conf.set("spark.sql.shuffle.partitions",
      statePartitionsFor(spark, bytes).toString)
    // per-commit checkpoint costs (checksum sidecars, FileContext
    // rename forks) dominate small micro-batches — see StreamTuning
    StreamTuning.tune(scoped)
    scoped
  }

  /** Per-day, per-type event counts and value sums over the events
    * stream. Output: (day_start epoch-micros, event_type, n, sum_value).
    */
  def dailyTypeRollup(spark: SparkSession, sfDir: String): DataFrame = {
    // events.ts is either parquet TIMESTAMP(NANOS) (readable only as an
    // epoch-nanos long, see Tables) or TIMESTAMP(MICROS)/NTZ, depending
    // on the generator; the stream converts either to a µs event time.
    val s = drainSession(spark, sfDir, "events.parquet")
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema
    val tsm =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts DIV 1000"))
      else col("ts").cast("timestamp")

    val windowed = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(col("event_type"), col("value"), tsm.as("tsm"))
      .withWatermark("tsm", "1 hour")
      .groupBy(window(col("tsm"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

    // Complete mode into a uniquely-named memory sink: every window is
    // visible at drain time (append would hold back windows newer than
    // the final watermark), and reruns in one session can't collide.
    val sink = "stream_rollup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    windowed.writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

    s.table(sink)
      .select(unix_micros(col("window.start")).as("day_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** SLIDING-window rollup over the events stream — each event lands in
    * duration/slide overlapping windows (here 1 day every 6 hours → 4),
    * the standard trailing-window monitoring shape. Same watermark /
    * AvailableNow drain as [[dailyTypeRollup]]; state is bounded by
    * (windows in flight × groups).
    */
  def slidingRollup(spark: SparkSession, sfDir: String,
      duration: String = "1 day", slide: String = "6 hours"): DataFrame = {
    val s = drainSession(spark, sfDir, "events.parquet")
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema
    val tsm =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts DIV 1000"))
      else col("ts").cast("timestamp")
    val windowed = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(col("value"), tsm.as("tsm"))
      .withWatermark("tsm", "1 hour")
      .groupBy(window(col("tsm"), duration, slide))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val sink = "stream_sliding_" + java.util.UUID.randomUUID().toString.replace("-", "")
    windowed.writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    s.table(sink)
      .select(unix_micros(col("window.start")).as("win_start"),
        col("n"), col("sum_value"))
  }

  /** Per-day distinct users over the events STREAM via the mergeable
    * KMV sketch aggregate — sketches ARE the streaming-state story at
    * scale: the per-window state is O(k), not O(distinct users), the
    * partial buffers merge map-side each micro-batch, and the same
    * sketch bytes could publish to a serving store for cross-stream
    * union. Output: (day_start epoch-micros, sketch bytes); callers
    * estimate (exact below k — the driver row's guard).
    */
  def dailyDistinctUsersSketch(spark: SparkSession, sfDir: String,
      k: Int = 65536): DataFrame = {
    val s = drainSession(spark, sfDir, "events.parquet")
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema
    val tsm =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts DIV 1000"))
      else col("ts").cast("timestamp")
    val windowed = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(col("user_id"), tsm.as("tsm"))
      .withWatermark("tsm", "1 hour")
      .groupBy(window(col("tsm"), "1 day"))
      .agg(graft.functions.FrequencySketches.kmv_sketch(col("user_id"), k).as("sk"))
    val sink = "stream_distinct_" + java.util.UUID.randomUUID().toString.replace("-", "")
    windowed.writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    s.table(sink)
      .select(unix_micros(col("window.start")).as("day_start"), col("sk"))
  }

  /** Per-day heavy hitters over the event stream — the Misra-Gries
    * sketch as Structured-Streaming state: O(capacity) per window
    * instead of O(distinct users), partials merging map-side each
    * micro-batch; completes the streaming sketch family next to
    * [[dailyDistinctUsersSketch]] (KMV). Below capacity the counts are
    * exact (the driver row's guard); past it the estimator semantics
    * are spec-gated in FrequencySketchesSpec. Output: (day_start
    * epoch-micros, array<struct<item,count>> best-first).
    */
  def dailyTopUsersSketch(spark: SparkSession, sfDir: String,
      capacity: Int = 65536): DataFrame = {
    val s = drainSession(spark, sfDir, "events.parquet")
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema
    val tsm =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts DIV 1000"))
      else col("ts").cast("timestamp")
    val windowed = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(col("user_id"), tsm.as("tsm"))
      .withWatermark("tsm", "1 hour")
      .groupBy(window(col("tsm"), "1 day"))
      .agg(graft.functions.FrequencySketches
        .heavy_hitters(col("user_id"), capacity).as("hh"))
    val sink = "stream_hh_" + java.util.UUID.randomUUID().toString.replace("-", "")
    windowed.writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    s.table(sink)
      .select(unix_micros(col("window.start")).as("day_start"), col("hh"))
  }

  /** Per-day value-distribution sketch over the event stream — the
    * mergeable quantile sketch as Structured-Streaming state, closing
    * the streaming sketch trio (KMV distinct, Misra-Gries heavy
    * hitters, quantiles): any percentile of a day's value stream from
    * O(k) state per window, exact while every item is retained (the
    * driver row's guard). Values ride as exact DECIMAL(18,2) cents so
    * float summation/compare conventions never split the engines.
    * Output: (day_start epoch-micros, sketch bytes).
    */
  def dailyValueSketch(spark: SparkSession, sfDir: String,
      k: Int = 32768): DataFrame = {
    val s = drainSession(spark, sfDir, "events.parquet")
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema
    val tsm =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts DIV 1000"))
      else col("ts").cast("timestamp")
    val windowed = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(tsm.as("tsm"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withWatermark("tsm", "1 hour")
      .groupBy(window(col("tsm"), "1 day"))
      .agg(graft.functions.QuantileSketchAgg.sketch_agg(col("cents"), k).as("sk"))
    val sink = "stream_quant_" + java.util.UUID.randomUUID().toString.replace("-", "")
    windowed.writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    s.table(sink)
      .select(unix_micros(col("window.start")).as("day_start"), col("sk"))
  }

  /** Streaming exact dedup over the documents stream — drains
    * [[StreamingDedup.firstOccurrences]] (flatMapGroupsWithState keyed
    * state) with `AvailableNow` into a memory sink: one row per distinct
    * text, the min-doc_id representative, emitted by the key's first
    * micro-batch. Cross-batch state semantics are spec'd in
    * SessionStreamSpec with a two-batch MemoryStream; this entry point
    * is the batch-verifiable harness drain.
    */
  def streamDedupFirstOccurrence(spark: SparkSession, sfDir: String): DataFrame = {
    val s = drainSession(spark, sfDir, "documents.parquet")
    val schema = s.read.parquet(s"$sfDir/documents.parquet").schema
    val stream = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    val deduped = StreamingDedup.firstOccurrences(stream, "doc_id", "text")
      .toDF("doc_id", "text")
    val sink = "stream_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    deduped.writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    s.table(sink)
  }

  /** STREAMING session windows: per-user sessions with a 30-minute
    * inactivity gap over the events stream — the stateful MERGING
    * window operator (unlike tumbling/sliding, a session's extent is
    * data-dependent: windows merge as events arrive, and the watermark
    * is what lets finalized sessions evict). `AvailableNow` drain +
    * complete mode for the batch-verifiable harness shape, exactly the
    * [[dailyTypeRollup]] contract.
    */
  def sessionRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val s = drainSession(spark, sfDir, "events.parquet")
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema
    val tsm =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts DIV 1000"))
      else col("ts").cast("timestamp")
    val windowed = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(col("user_id"), col("value"), tsm.as("tsm"))
      .withWatermark("tsm", "1 hour")
      .groupBy(col("user_id"), session_window(col("tsm"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val sink = "stream_session_" + java.util.UUID.randomUUID().toString.replace("-", "")
    windowed.writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    s.table(sink)
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start"),
        unix_micros(col("session_window.end")).as("session_end"),
        col("n_events"), col("sum_value"))
  }

  /** STREAM-STATIC enrichment join: the events stream joined to a
    * broadcast dimension table (nation, keyed by user_id mod 25), then
    * windowed per-day per-nation rollup. The static side is planned as
    * a broadcast hash join INSIDE each micro-batch — no streaming
    * state for the join at all, which is why stream-static enrichment
    * is the default dimension-join shape at any scale: the dim rides
    * to executors once per batch and the stream never shuffles on the
    * join key.
    */
  def enrichedRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val s = drainSession(spark, sfDir, "events.parquet")
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema
    val tsm =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts DIV 1000"))
      else col("ts").cast("timestamp")
    val dim = broadcast(s.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name")))
    val windowed = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(col("user_id"), col("value"), tsm.as("tsm"))
      .join(dim, pmod(col("user_id"), lit(25L)) === col("n_nationkey"))
      .withWatermark("tsm", "1 hour")
      .groupBy(window(col("tsm"), "1 day"), col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val sink = "stream_enrich_" + java.util.UUID.randomUUID().toString.replace("-", "")
    windowed.writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    s.table(sink)
      .select(unix_micros(col("window.start")).as("day_start"),
        col("n_name"), col("n"), col("sum_value"))
  }

  /** STREAM-STREAM interval join: each `view` event joined to the same
    * user's `click`/`purchase` events landing within the following
    * `withinMinutes` — the attribution shape (impression → conversion).
    * Both sides carry a watermark and the join condition carries an
    * event-time range, so Spark bounds each side's join state to the
    * watermark + interval horizon: on an unbounded stream the state
    * store holds only the trailing window of each side, which is the
    * property that lets this run forever at cluster scale. Inner-join
    * matches emit as they are found (no watermark hold-back), so the
    * `AvailableNow` drain sees every pair.
    *
    * Output (batch-aggregated from the drained pairs, which keeps the
    * streaming stage pure join): one row per converting user —
    * (user_id, n_pairs, sum_value over the joined conversions).
    */
  def viewConversionJoin(spark: SparkSession, sfDir: String,
      withinMinutes: Int = 30): DataFrame = {
    val s = drainSession(spark, sfDir, "events.parquet")
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema
    def tsm =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts DIV 1000"))
      else col("ts").cast("timestamp")
    def side(types: Seq[String], prefix: String) = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .where(col("event_type").isin(types: _*))
      .select(col("user_id").as(s"${prefix}_user"),
        tsm.as(s"${prefix}_ts"), col("value").as(s"${prefix}_value"))
      .withWatermark(s"${prefix}_ts", "1 hour")

    val views = side(Seq("view"), "v")
    val convs = side(Seq("click", "purchase"), "c")
    val joined = views.join(convs, expr(
      s"""v_user = c_user AND
         |c_ts > v_ts AND
         |c_ts <= v_ts + INTERVAL $withinMinutes MINUTES""".stripMargin))

    val sink = "stream_join_" + java.util.UUID.randomUUID().toString.replace("-", "")
    joined.writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    s.table(sink)
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("c_value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  private val outerJoinDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Stream-stream LEFT OUTER interval join: every view either pairs
    * with its conversions (like [[viewConversionJoin]]) or — once the
    * watermark proves its 30-minute window can no longer match — emits
    * exactly once with a NULL right side. The null-side emission is the
    * part plain inner join state handling gets free and outer joins do
    * not: an unmatched row may only leave state when BOTH sides'
    * watermarks have passed its window (emitting earlier risks a
    * late-arriving match = a wrong null).
    *
    * Bounded-drain determinism: a file stream ends when the files end,
    * but rows near the stream's end would still be inside the watermark
    * and their nulls would never flush. The fixture appends a
    * watermark-flush file (two -1-user rows far past the data's max
    * event time, one per join side, mtime-ordered AFTER the data so it
    * is the LAST micro-batch) — the closing no-data batch then carries
    * every real view past its window and the outer results are total,
    * which is what makes the batch LEFT JOIN an exact oracle. On a real
    * deployment the stream just keeps running and the same flush is the
    * next hour of traffic.
    *
    * Output: (user_id, matched, unmatched) — conversions paired and
    * views that expired unpaired, per user.
    */
  def viewConversionOuterJoin(spark: SparkSession, sfDir: String,
      withinMinutes: Int = 30): DataFrame = {
    val srcDir = outerJoinDirs.computeIfAbsent(sfDir, { _ =>
      val d = s"${System.getProperty("java.io.tmpdir")}/graft-outerjoin-" +
        java.util.UUID.randomUUID().toString.take(8)
      graft.meta.GraftFS.mkdirs(d)
      val (fs, _) = graft.meta.GraftFS.resolve(d)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(s"$sfDir/events.parquet"),
        fs, new org.apache.hadoop.fs.Path(s"$d/events.parquet"),
        false, spark.sparkContext.hadoopConfiguration)
      val df = spark.read.parquet(s"$sfDir/events.parquet")
      val isLong = df.schema("ts").dataType == org.apache.spark.sql.types.LongType
      val maxRow = df.orderBy(col("ts").desc).limit(1)
      // one flush row per join side; the click side sits far past the
      // view side so the pair cannot match itself
      def flush(etype: String, hours: Int) = maxRow.select(df.columns.map {
        case "event_id" => lit(-1L).as("event_id")
        case "ts" => (if (isLong) col("ts") + lit(hours * 3600L * 1000000000L)
          else col("ts") + expr(s"INTERVAL $hours HOURS")).as("ts")
        case "user_id" => lit(-1L).as("user_id")
        case "event_type" => lit(etype).as("event_type")
        case other => col(other)
      }: _*)
      val tmp = s"$d/.flush-tmp"
      flush("view", 10).union(flush("click", 30)).coalesce(1)
        .write.parquet(tmp)
      val part = graft.meta.GraftFS.list(tmp)
        .find(_.getPath.getName.endsWith(".parquet")).get
      // mtime after events.parquet => the file source (mtime order)
      // processes it last
      val flushPath = new org.apache.hadoop.fs.Path(s"$d/zz-flush.parquet")
      graft.meta.GraftFS.rename(part.getPath, flushPath, fs)
      graft.meta.GraftFS.deleteRecursive(tmp)
      fs.setTimes(flushPath, System.currentTimeMillis() + 60000, -1)
      d
    })
    val s = drainSession(spark, srcDir, "events.parquet")
    val schema = s.read.parquet(s"$srcDir/events.parquet").schema
    def tsm =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts DIV 1000"))
      else col("ts").cast("timestamp")
    // No maxFilesPerTrigger: both files (data + flush sentinel) land in
    // ONE data batch. The watermark is computed from the batch's max
    // event time AFTER it runs — the sentinel rows push it past every
    // real view's window either way — and the unmatched nulls flush in
    // AvailableNow's closing no-data batch exactly as they did when the
    // sentinel arrived as its own batch. Drained output is identical
    // (oracle-checked); one stream-stream-join micro-batch of state
    // commits is saved.
    def side(types: Seq[String], prefix: String) = s.readStream
      .schema(schema)
      .parquet(srcDir)
      .where(col("event_type").isin(types: _*))
      .select(col("user_id").as(s"${prefix}_user"),
        tsm.as(s"${prefix}_ts"), col("value").as(s"${prefix}_value"))
      .withWatermark(s"${prefix}_ts", "1 hour")

    val views = side(Seq("view"), "v")
    val convs = side(Seq("click", "purchase"), "c")
    val joined = views.join(convs, expr(
      s"""v_user = c_user AND
         |c_ts > v_ts AND
         |c_ts <= v_ts + INTERVAL $withinMinutes MINUTES""".stripMargin),
      "leftOuter")

    val sink = "stream_ojoin_" + java.util.UUID.randomUUID().toString.replace("-", "")
    joined.writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    s.table(sink)
      .filter(col("v_user") >= 0) // drop the watermark-flush sentinel
      .groupBy(col("v_user").as("user_id"))
      .agg(count(col("c_user")).as("matched"),
        sum(when(col("c_user").isNull, 1L).otherwise(0L)).as("unmatched"))
  }
}
