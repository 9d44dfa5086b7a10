package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the reference's only stream shape is
  * "watch a source and process what arrives" (HF streaming iterator,
  * batchProcessVideos.py:111–124). Here the same events table is
  * consumed through `readStream` with event-time tumbling windows —
  * the batch parquet drives the stream to completion synchronously,
  * so the result is deterministic and oracle-checkable.
  *
  * Scale notes: in production this is the identical plan over a
  * file-arrival or Kafka source with a watermark; windowed state is
  * partitioned by (window, event_type) and bounded.
  */
object EventStream {

  /** Runs `f` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`, restoring the session value after. Streaming queries bind
    * their STATE STORE count to the shuffle-partition setting at start
    * time (AQE never re-plans a stream), and every micro-batch commits
    * every state store — so a test-scale stream pays 32 store commits
    * per stateful operator per batch for data that fits in a handful.
    * The rollups below size state to their volume; a production deploy
    * sizes this to sustained throughput instead. */
  private def withStatePartitions[A](spark: SparkSession, n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, old)
  }

  /** Streaming scan of the events table with normalized event-time
    * columns, schema-adaptive like Tables.events (the generator has
    * shipped `ts` as both TIMESTAMP(NANOS) — epoch-ns long under
    * `nanosAsLong` — and plain TIMESTAMP(MICROS)/NTZ). Surfaces the
    * same contract either way: `ets` a µs TimestampType event-time
    * column and `ts_ns` whole-µs epoch nanos (= DuckDB epoch_ns(ts));
    * the raw `ts` is dropped so no caller can depend on its physical
    * type. The file-stream source requires a directory/glob ("basePath
    * must be a directory") — the [e] glob keeps basePath = sfDir but
    * matches only the events table. */
  private def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(schema).parquet(s"$sfDir/[e]vents.parquet")
    val shaped = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", expr("(ts DIV 1000) * 1000"))
          .withColumn("ets", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        val tsUs = col("ts").cast(org.apache.spark.sql.types.TimestampType)
        raw.withColumn("ts_ns", unix_micros(tsUs) * lit(1000L))
          .withColumn("ets", timestamp_micros(unix_micros(tsUs)))
    }
    shaped.drop("ts")
  }

  /** Hourly tumbling-window counts/sums per event_type, computed by a
    * real streaming query (memory sink, complete mode). */
  def hourlyRollup(spark: SparkSession, sfDir: String): DataFrame = {
    // stable per-sfDir sink name; stop any leftover run of the same query
    val name = "graft_stream_hourly_" + math.abs(sfDir.hashCode).toString
    spark.streams.active.filter(q => Option(q.name).exists(_ == name)).foreach(_.stop())
    val stream = eventsStream(spark, sfDir)
      .withColumn("value_c", expr("CAST(round(value*100) AS BIGINT)"))
    val agg = stream
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_c"))
    withStatePartitions(spark, 8) {
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.table(name).select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"),
        (col("sum_c").cast("double") / 100.0).as("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  /** Watermarked APPEND-mode tumbling aggregation (§2.8 "watermarks +
    * windowed aggs"): events later than `delay` behind the max seen
    * event time are dropped; a window's row is emitted exactly once,
    * when the watermark passes its end. Input columns:
    * (ets timestamp, event_type string, value_c long). State is
    * bounded by open windows — the production shape for an unbounded
    * source, where complete-mode (q30) state would grow forever. */
  def windowedCounts(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ets", delay)
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_c"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_c"))

  /** Streaming exact dedup with BOUNDED state — the streaming member
    * of the dedup family (q24's fingerprint groupBy for an unbounded
    * source). `dropDuplicatesWithinWatermark` suppresses any row whose
    * `keyCols` were already seen while their state lives; a key's
    * state is evicted once the watermark (event time − `delay`)
    * passes its event time, so state is bounded by the delay window
    * instead of growing with the corpus — the only shape that
    * survives an unbounded 100 TB/day stream. (Corpus-wide exact
    * dedup of a BOUNDED table stays q24's hash aggregation.) Input
    * needs an `ets` timestamp column. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ets", delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming-dedup rollup driven to completion over the events
    * table (q70): every event is planted TWICE into the stream
    * (explode over a 2-element array), `dedupStream` on event_id
    * suppresses the copies, and the surviving rows aggregate per
    * event_type — so the oracle is a plain batch aggregate of the
    * original table. The delay is far larger than the table's time
    * span, so no state is evicted mid-run and the dedup is exact;
    * on a real unbounded stream a finite delay bounds the state
    * (StreamDedupSpec pins the eviction behavior). */
  def dedupRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_dedup_" + math.abs(sfDir.hashCode).toString
    spark.streams.active.filter(q => Option(q.name).exists(_ == name)).foreach(_.stop())
    val stream = eventsStream(spark, sfDir)
      .withColumn("value_c", expr("CAST(round(value*100) AS BIGINT)"))
      .withColumn("copy", explode(array(lit(1), lit(2)))) // planted dups
    val deduped = dedupStream(stream, Seq("event_id"), delay = "3650 days")
    withStatePartitions(spark, 8) {
      val q = deduped
        .select(col("event_type"), col("value_c"))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.table(name)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_c"))
      .orderBy(col("event_type"))
  }

  /** Stream-STREAM interval join driven to completion (q76): clicks
    * and views are two watermarked streams (here both fed from the
    * events table; in production two live sources), inner-joined on
    * user_id plus an event-time range — every view in the 24-hour
    * window before a click. The range condition between the two
    * event-time columns is what lets Spark evict join state as the
    * watermark advances (without it, both sides buffer forever on an
    * unbounded stream). Matches are appended to the sink as they are
    * produced; the per-click aggregation runs as a batch over the
    * sink so the whole thing stays oracle-checkable (= the batch
    * interval join's inner-match subset, q73 without zero-view
    * clicks). The ns-precision strict bound rides along as a plain
    * filter so the oracle is integer-exact. */
  /** SLIDING event-time windows (2 h width, 1 h slide): every event
    * contributes to width/slide = 2 overlapping windows (Spark aligns
    * starts to the slide grid, so the member windows of t are
    * floor_h(t) and floor_h(t) − 1 h — what the oracle unnests). The
    * tumbling rollup (q30) covers the disjoint case; this is the
    * moving-average/rate-monitoring shape. State is (window, type)-
    * keyed and bounded like the tumbling case, ×(width/slide). */
  def slidingRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_sliding_" + math.abs(sfDir.hashCode).toString
    spark.streams.active.filter(q => Option(q.name).exists(_ == name)).foreach(_.stop())
    val stream = eventsStream(spark, sfDir)
      .withColumn("value_c", expr("CAST(round(value*100) AS BIGINT)"))
    val agg = stream
      .groupBy(window(col("ets"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_c"))
    withStatePartitions(spark, 8) {
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.table(name).select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_c"))
      .orderBy(col("win_start"), col("event_type"))
  }

  def intervalJoinRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_join_" + math.abs(sfDir.hashCode).toString
    spark.streams.active.filter(q => Option(q.name).exists(_ == name)).foreach(_.stop())
    def src = eventsStream(spark, sfDir)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
        col("ets").as("cets"), col("ts_ns").as("cts"))
      .withWatermark("cets", "3650 days")
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("event_id").as("view_id"),
        col("ets").as("vets"), col("ts_ns").as("vts"),
        expr("CAST(round(value*100) AS BIGINT)").as("value_c"))
      .withWatermark("vets", "3650 days")
    val joined = clicks.join(views,
      col("c_uid") === col("v_uid") &&
        col("vets") >= col("cets") - expr("INTERVAL 24 HOURS") &&
        col("vets") <= col("cets") &&
        col("vts") > col("cts") - lit(86400L * 1000000000L))
    withStatePartitions(spark, 8) {
      val q = joined.select(col("click_id"), col("c_uid").as("user_id"), col("value_c"))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.table(name)
      .groupBy(col("click_id"), col("user_id"))
      .agg(count(lit(1)).as("n_views"), sum(col("value_c")).as("view_value_c"))
      .orderBy(col("click_id"))
  }

  /** Stream-stream LEFT OUTER interval join (q193): every click joins
    * the views of the same user in the hour before it — and clicks
    * with NO such view must still come out, which is the part plain
    * stream-stream inner joins (q76) cannot express. Outer emission is
    * WATERMARK-DRIVEN: an unmatched click leaves the state store only
    * once the watermark proves no matching view can still arrive, so a
    * stream whose watermark never passes its last click would hold
    * those rows forever and the answer would depend on shutdown
    * timing. The harness therefore replays the batch table through a
    * scratch directory as THREE ordered file drops — the real events,
    * then two far-future sentinel drops (one click + one view each, so
    * BOTH sides' watermarks advance) — with maxFilesPerTrigger=1: by
    * the time the second sentinel batch runs, the watermark from the
    * first sentinel already exceeds every real click's eviction bound,
    * so the state fully drains no matter whether the engine schedules
    * a trailing no-data batch. Sentinels carry negative ids and are
    * dropped before the rollup. The final answer provably equals the
    * batch LEFT JOIN the oracle runs. */
  /** Shared watermark-drain harness: replays the events table through
    * a scratch directory as ordered file drops — the real rows, then
    * two far-future sentinel drops (one click + one view each, so BOTH
    * sides' watermarks advance) — and returns a thunk opening the
    * stream source over them. Every rollup whose answer is only
    * deterministic once the watermark provably passes each real row
    * (outer-join unmatched emission, append-mode window flush) uses
    * this: with 2 files per trigger, batch 0 = real data + sentinel 1
    * (so the watermark computed at its end already exceeds every real
    * row's eviction/emission bound) and batch 1 = sentinel 2 (applies
    * it and drains the state) — no dependence on whether the engine
    * schedules a trailing no-data batch. The real-data drop is
    * coalesced to ONE file so it cannot fan into one micro-batch per
    * shuffle partition (~30 state-store commit rounds for nothing);
    * production replaces the replay with a live source. Sentinels
    * carry negative ids/users and are dropped before each rollup. */
  private def sentinelReplay(spark: SparkSession, tag: String,
      sfDir: String): () => DataFrame = {
    import graft.queries.Q
    val drops = java.nio.file.Paths.get(Q.scratchDir(spark, tag))
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("CAST(round(value*100) AS BIGINT)").as("value_c"),
        timestamp_micros(expr("ts_ns DIV 1000")).as("ets"))
    val maxUs = ev.agg(max(unix_micros(col("ets")))).collect()(0).getLong(0) // 1-row scalar
    def sentinel(idBase: Long, us: Long): DataFrame =
      spark.range(1).select(
        lit(idBase).as("event_id"), lit(-1L).as("user_id"),
        lit("click").as("event_type"), lit(0L).as("value_c"),
        timestamp_micros(lit(us)).as("ets"))
        .union(spark.range(1).select(
          lit(idBase - 1).as("event_id"), lit(-1L).as("user_id"),
          lit("view").as("event_type"), lit(0L).as("value_c"),
          timestamp_micros(lit(us)).as("ets")))
    val day = 86400L * 1000000L
    val parts = Seq(ev.coalesce(1),
      sentinel(-1L, maxUs + 30 * day), sentinel(-3L, maxUs + 60 * day))
    val streamDir = drops.resolve("stream")
    java.nio.file.Files.createDirectories(streamDir)
    parts.zipWithIndex.foreach { case (df, i) =>
      val tmp = drops.resolve(s"tmp$i")
      df.write.mode("overwrite").parquet(tmp.toString)
      // flatten to one ordered file per drop; mtime drives the file
      // source's processing order under maxFilesPerTrigger
      val files = java.nio.file.Files.list(tmp).iterator()
      var k = 0
      while (files.hasNext) {
        val f = files.next()
        if (f.toString.endsWith(".parquet")) {
          val dst = streamDir.resolve(f"$i%02d_$k%04d.parquet")
          java.nio.file.Files.move(f, dst)
          dst.toFile.setLastModified(1700000000000L + i * 60000L)
          k += 1
        }
      }
    }
    val schema = spark.read.parquet(streamDir.toString).schema
    () => spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(streamDir.toString)
  }

  /** Runs `df` as an append-mode streaming query into a memory sink
    * named `name`, drained to completion, and returns the sink table.
    * No-data micro-batches exist to evict state when the watermark
    * advances with nothing arriving — under sentinelReplay eviction is
    * driven by the sentinel BATCHES themselves (batch N+1 applies
    * batch N's watermark), so the extra empty batches only add
    * state-store commit rounds; they are disabled for the run. */
  private def runDrained(spark: SparkSession, name: String,
      df: DataFrame): DataFrame = {
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val oldNoData = spark.conf.getOption(noDataKey)
    spark.conf.set(noDataKey, "false")
    // Measurement knob (tools/state_ab_probe.sh — the round-14 rung-3
    // A/B on q193's above-linear curve): SPARK_GRAFT_STATE_PROVIDER=
    // rocksdb swaps the per-batch state store for the RocksDB provider
    // (the one q199's transformWithState already requires,
    // TwsTimeline.scala) so the commit/rescan cost of the default
    // HDFS-backed in-memory map can be isolated from the join
    // machinery. Unset ⇒ the session default — results are provider-
    // independent either way; only the state commit path changes.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(providerKey)
    if (sys.env.get("SPARK_GRAFT_STATE_PROVIDER").contains("rocksdb"))
      spark.conf.set(providerKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
    // Measurement knob (round-16 optimization A/B): the drained
    // replays' state-partition count, overridable per session so one
    // JVM can compare counts under the same regime (the
    // SPARK_GRAFT_PR_VARIANT pattern). Results are partition-count
    // independent (deterministic join/agg semantics; the sink is
    // batch-aggregated after the drain); only the number of state
    // stores per stateful operator changes. Default 2 — the shipped,
    // driver-comparable value.
    val drainParts = spark.conf.getOption("graft.drain.statePartitions")
      .map(_.toInt).getOrElse(2)
    try withStatePartitions(spark, drainParts) {
      val q = df.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
    } finally {
      oldNoData match {
        case Some(v) => spark.conf.set(noDataKey, v)
        case None => spark.conf.unset(noDataKey)
      }
      oldProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None if sys.env.get("SPARK_GRAFT_STATE_PROVIDER").contains("rocksdb") =>
          spark.conf.unset(providerKey)
        case None => ()
      }
    }
    spark.table(name)
  }

  /** Stream-stream LEFT SEMI interval join (q274): views that ARE
    * followed by a same-user click within the hour, each view emitted
    * AT MOST ONCE — the last missing mode of the stream-stream join
    * matrix (q76 inner, q193 left outer, q250 full outer). Semi is
    * its own state machine, not a projection of inner: a view must
    * emit on its FIRST arriving match and then be remembered as
    * emitted (a second click must NOT re-emit it) while it stays in
    * state until the watermark passes vets + 1 h. The drained output
    * provably equals the batch EXISTS the oracle runs. At scale the
    * semi's state is STRICTLY SMALLER than the inner join's output
    * side (no match multiplication — one output row per view
    * maximum), which is exactly why retrieval-style "has a
    * conversion" questions should plan semi, never inner+distinct. */
  def leftSemiJoinRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_semi_" + math.abs(sfDir.hashCode).toString
    spark.streams.active.filter(q => Option(q.name).exists(_ == name)).foreach(_.stop())
    val src = sentinelReplay(spark, "graft_stream_semi", sfDir)
    val views = src().filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("event_id").as("view_id"),
        col("ets").as("vets"), col("value_c"))
      .withWatermark("vets", "1 minute")
    val clicks = src().filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ets").as("cets"))
      .withWatermark("cets", "1 minute")
    val joined = views.join(clicks,
      col("v_uid") === col("c_uid") &&
        col("cets") >= col("vets") &&
        col("cets") <= col("vets") + expr("INTERVAL 1 HOUR"),
      "leftSemi")
    runDrained(spark, name, joined)
      .filter(col("v_uid") >= 0) // sentinels carry user -1 and match themselves
      .groupBy(col("v_uid").as("user_id"))
      .agg(count(lit(1)).as("n_converted_views"),
        coalesce(sum(col("value_c")), lit(0L)).as("converted_value_c"))
      .orderBy(col("user_id"))
  }

  def outerJoinRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_outer_" + math.abs(sfDir.hashCode).toString
    spark.streams.active.filter(q => Option(q.name).exists(_ == name)).foreach(_.stop())
    val src = sentinelReplay(spark, "graft_stream_outer", sfDir)
    val clicks = src().filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
        col("ets").as("cets"))
      .withWatermark("cets", "1 minute")
    val views = src().filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("event_id").as("view_id"),
        col("ets").as("vets"), col("value_c"))
      .withWatermark("vets", "1 minute")
    val joined = clicks.join(views,
      col("c_uid") === col("v_uid") &&
        col("vets") >= col("cets") - expr("INTERVAL 1 HOUR") &&
        col("vets") <= col("cets"),
      "leftOuter")
    runDrained(spark, name, joined
        .select(col("click_id"), col("c_uid").as("user_id"),
          col("view_id"), col("value_c")))
      .filter(col("click_id") >= 0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("view_id")).as("n_matched"),
        countDistinct(col("click_id")).as("n_clicks"),
        coalesce(sum(col("value_c")), lit(0L)).as("matched_value_c"))
      .orderBy(col("user_id"))
  }

  /** Stream-stream FULL OUTER interval join (q250): the completion of
    * the outer-join matrix q76 (inner) and q193 (left) leave open —
    * clicks with no view in the preceding hour AND views that precede
    * no click within the following hour both emit, each exactly once,
    * when the watermark proves no partner can still arrive. The view
    * side's unmatched emission is the genuinely new state machine
    * here: a view must be HELD until the watermark passes the last
    * click time that could still claim it (its own time + 1 h), then
    * released as a null-click row — the same sentinel-advanced drain
    * makes that deterministic. At scale, state is bounded by the
    * interval + watermark delay on both sides; everything partitions
    * by user_id. The answer provably equals the batch FULL JOIN the
    * oracle runs. */
  def fullOuterJoinRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_fouter_" + math.abs(sfDir.hashCode).toString
    spark.streams.active.filter(q => Option(q.name).exists(_ == name)).foreach(_.stop())
    val src = sentinelReplay(spark, "graft_stream_fouter", sfDir)
    val clicks = src().filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
        col("ets").as("cets"))
      .withWatermark("cets", "1 minute")
    val views = src().filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("event_id").as("view_id"),
        col("ets").as("vets"), col("value_c"))
      .withWatermark("vets", "1 minute")
    val joined = clicks.join(views,
      col("c_uid") === col("v_uid") &&
        col("vets") >= col("cets") - expr("INTERVAL 1 HOUR") &&
        col("vets") <= col("cets"),
      "fullOuter")
    runDrained(spark, name, joined
        .select(coalesce(col("c_uid"), col("v_uid")).as("user_id"),
          col("click_id"), col("view_id"), col("value_c")))
      .filter(col("user_id") >= 0) // sentinels carry user -1
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("click_id").isNotNull && col("view_id").isNotNull, 1))
          .as("n_matched"),
        count(when(col("view_id").isNull, 1)).as("n_click_only"),
        count(when(col("click_id").isNull, 1)).as("n_view_only"),
        coalesce(sum(when(col("view_id").isNotNull, col("value_c"))), lit(0L))
          .as("view_value_c"))
      .orderBy(col("user_id"))
  }

  /** CHAINED stateful operators in one streaming query (q251): a
    * stream-stream time-interval join whose output feeds an
    * append-mode event-time windowed aggregation — two stateful
    * operators back to back, the shape Spark only made correct with
    * watermark propagation between stateful operators (late-record
    * filtering at the second operator uses the join-adjusted
    * watermark; single-operator queries never exercise that path).
    * Semantics: hourly attributed view volume — for every (click,
    * same-user view in the preceding hour) pair, count pairs and sum
    * view value into the CLICK's hour. Each window flushes exactly
    * once when the sentinel-advanced watermark passes its end; the
    * sentinel pair (which matches itself) is filtered between the two
    * stateful operators, which is a stateless projection and costs
    * nothing. State: join buffers bounded by interval + delay,
    * aggregation state bounded by open windows — both per-user/
    * per-window partitioned at 100 TB. */
  def chainedWindowRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_chain_" + math.abs(sfDir.hashCode).toString
    spark.streams.active.filter(q => Option(q.name).exists(_ == name)).foreach(_.stop())
    val src = sentinelReplay(spark, "graft_stream_chain", sfDir)
    val clicks = src().filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
        col("ets").as("cets"))
      .withWatermark("cets", "1 minute")
    val views = src().filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("event_id").as("view_id"),
        col("ets").as("vets"), col("value_c"))
      .withWatermark("vets", "1 minute")
    val joined = clicks.join(views,
      col("c_uid") === col("v_uid") &&
        col("vets") >= col("cets") - expr("INTERVAL 1 HOUR") &&
        col("vets") <= col("cets"))
      .filter(col("click_id") >= 0) // drop the self-matching sentinel pair
    // distinct aggregates are unsupported INSIDE a stream (q193's
    // countDistinct runs on the drained sink table, a batch frame);
    // the windowed agg sticks to algebraic count/sum, which is also
    // the only shape whose partial aggregation stays map-side at scale
    val agg = joined
      .groupBy(window(col("cets"), "1 hour"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("value_c")).as("view_value_c"))
    runDrained(spark, name, agg
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_start"),
          col("n_pairs"), col("view_value_c")))
      .orderBy(col("hour_start"))
  }

  /** foreachBatch IDEMPOTENT MERGE SINK (q258): the production
    * exactly-once pattern for sinks Spark has no transactional
    * connector for — each micro-batch MERGES into a versioned
    * external store keyed by batchId, so a replayed batch (failure →
    * restart re-delivers the last uncommitted batch) overwrites its
    * own version instead of double-applying. Here the orders change
    * log arrives as TWO ordered file drops (maxFilesPerTrigger=1);
    * foreachBatch folds each batch's latest-per-customer compaction
    * into state_v<batchId> = merge(state_v<batchId-1>, batch) — an
    * associative max_by fold, so ANY batch slicing converges to the
    * batch q106 compaction (the q130 invariant, but with state in an
    * EXTERNAL parquet store instead of the engine's state store: what
    * you run when the sink is a database). The final version is the
    * answer. At scale each merge is one co-keyed shuffle of
    * (customers-in-batch ∪ changed-state) — never the full history. */
  def foreachBatchMergeRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.queries.Q
    val root = java.nio.file.Paths.get(Q.scratchDir(spark, "graft_stream_febatch"))
    val ms = unix_millis(col("o_orderdate").cast("timestamp"))
    val orders = graft.sources.Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), ms.as("ms"),
        expr("CAST(round(o_totalprice*100) AS BIGINT)").as("pc"),
        col("o_orderstatus"))
    // two ordered drops, split by order key parity (arbitrary but
    // deterministic); mtime drives file-source order
    val streamDir = root.resolve("stream")
    java.nio.file.Files.createDirectories(streamDir)
    Seq(orders.filter(col("o_orderkey") % 2 === 0),
        orders.filter(col("o_orderkey") % 2 === 1))
      .zipWithIndex.foreach { case (df, i) =>
        val tmp = root.resolve(s"tmp$i")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val files = java.nio.file.Files.list(tmp).iterator()
        var k = 0
        while (files.hasNext) {
          val f = files.next()
          if (f.toString.endsWith(".parquet")) {
            val dst = streamDir.resolve(f"$i%02d_$k%04d.parquet")
            java.nio.file.Files.move(f, dst)
            dst.toFile.setLastModified(1700000000000L + i * 60000L)
            k += 1
          }
        }
      }
    val schema = spark.read.parquet(streamDir.toString).schema
    def compact(df: DataFrame): DataFrame = df
      .groupBy(col("o_custkey"))
      .agg(max_by(struct(col("o_orderkey"), col("ms"), col("pc"),
          col("o_orderstatus")), struct(col("ms"), col("o_orderkey"))).as("latest"),
        count(lit(1)).as("n_orders"))
    // AtomicLong, not a plain var (ADVICE r11): the foreachBatch body
    // runs on the stream-execution thread and the caller reads after
    // processAllAvailable()/stop() — the atomic gives an explicit
    // happens-before instead of leaning on incidental synchronization
    // inside StreamingQuery.
    val lastVersion = new java.util.concurrent.atomic.AtomicLong(-1L)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prev = root.resolve(s"state_v${batchId - 1}")
        val cur = compact(batch)
        val merged =
          if (java.nio.file.Files.exists(prev)) {
            val old = spark.read.parquet(prev.toString)
            // associative fold: latest-of(old, new) per key, counts add
            compact(old.select(col("o_custkey"), col("latest.o_orderkey"),
                col("latest.ms"), col("latest.pc"), col("latest.o_orderstatus"))
              .union(cur.select(col("o_custkey"), col("latest.o_orderkey"),
                col("latest.ms"), col("latest.pc"), col("latest.o_orderstatus"))))
              .drop("n_orders")
              .join(old.select(col("o_custkey"), col("n_orders").as("n_old"))
                .join(cur.select(col("o_custkey"), col("n_orders").as("n_new")),
                  Seq("o_custkey"), "fullOuter")
                .select(col("o_custkey"),
                  (coalesce(col("n_old"), lit(0L))
                    + coalesce(col("n_new"), lit(0L))).as("n_orders")),
                Seq("o_custkey"))
          } else cur
        // idempotence: the version is keyed by batchId — a replayed
        // batch rewrites state_v<id> from state_v<id-1>, never
        // double-applies
        merged.write.mode("overwrite")
          .parquet(root.resolve(s"state_v$batchId").toString)
        lastVersion.getAndUpdate(v => math.max(v, batchId))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(root.resolve(s"state_v${lastVersion.get()}").toString)
      .select(col("o_custkey"),
        col("latest.o_orderkey").as("latest_orderkey"),
        col("latest.ms").as("latest_order_ms"),
        col("latest.pc").as("latest_price_c"),
        col("latest.o_orderstatus").as("latest_status"),
        col("n_orders"))
      .orderBy(col("o_custkey"))
  }

  /** Stream-STATIC broadcast enrichment (q101): the streaming side of
    * the reference's audio-lookup join (dataLoader.py:5–13 — a small
    * dimension consulted per item). The dimension is a plain BATCH
    * DataFrame broadcast under the stream — Spark re-plans it per
    * micro-batch (a changed dim file is picked up on the next batch),
    * and the join itself is STATELESS: nothing buffers, watermarks are
    * irrelevant, each arriving row joins and leaves. That makes it the
    * cheapest streaming join shape and the right one whenever one side
    * is dimension-sized — the stream-stream machinery (q76) is only
    * for two unbounded sides. */
  def enrichRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_enrich_" + math.abs(sfDir.hashCode).toString
    spark.streams.active.filter(q => Option(q.name).exists(_ == name)).foreach(_.stop())
    val stream = eventsStream(spark, sfDir)
      .select(col("user_id"),
        expr("CAST(round(value*100) AS BIGINT)").as("value_c"))
    val dim = graft.sources.Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = stream.join(broadcast(dim), col("user_id") === col("c_custkey"))
    withStatePartitions(spark, 8) {
      val q = joined.select(col("c_mktsegment"), col("value_c"))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.table(name)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_c"))
      .orderBy(col("c_mktsegment"))
  }

  /** The custom stateful sessionizer driven to completion under the
    * oracle gate (q102): per-user open sessions live in GroupState
    * across micro-batches; only CLOSED sessions are emitted (a gap >
    * gapNs closes one), so each user's trailing open session never
    * appears — exactly what the oracle drops. The whole parquet
    * arrives as one micro-batch here (single file), so every closure
    * decision sees totally-ordered per-user data; on a live unbounded
    * source the same operator runs with batches in arrival order and
    * an idle-timeout would flush trailing sessions. Ties (equal ts)
    * are sum/count/min/max-invariant, so the batch-internal sort is
    * deterministic where it matters. */
  def statefulSessionRollup(spark: SparkSession, sfDir: String,
      gapNs: Long = 1800L * 1000000000L): DataFrame = {
    import spark.implicits._
    val name = "graft_stream_sessions_" + math.abs(sfDir.hashCode).toString
    spark.streams.active.filter(q => Option(q.name).exists(_ == name)).foreach(_.stop())
    // ts_ns is already whole-µs epoch nanos — DuckDB sees the same µs
    val events = eventsStream(spark, sfDir)
      .select(col("user_id"), col("ts_ns").as("ts"),
        expr("CAST(round(value*100) AS BIGINT)").as("value_c"))
      .as[(Long, Long, Long)]
    val sessions = sessionizeStateful(events, gapNs)
    withStatePartitions(spark, 8) {
      val q = sessions.toDF()
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.table(name)
      .select(col("user_id"), col("start_ns"), col("end_ns"),
        col("n_events"), col("sum_c"))
      .orderBy(col("user_id"), col("start_ns"))
  }

  /** STREAMING CDC apply: the change log (orders) arrives as a
    * stream; distributed streaming state keeps the latest version per
    * key (max_by over the (ms, orderkey) version vector) plus the
    * change count. The merge is associative+commutative, so the final
    * table is identical for ANY micro-batch slicing — and equals the
    * batch q106 compaction, which is exactly what the oracle checks.
    * Complete-mode memory sink here (test harness); production sinks
    * each updated key to a keyed store via foreachBatch, state stays
    * partitioned by key either way. */
  def cdcLatestRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_cdc_" + math.abs(sfDir.hashCode).toString
    spark.streams.active.filter(q => Option(q.name).exists(_ == name)).foreach(_.stop())
    val schema = spark.read.parquet(s"$sfDir/orders.parquet").schema
    val ms = unix_millis(col("o_orderdate").cast("timestamp"))
    val agg = spark.readStream.schema(schema).parquet(s"$sfDir/[o]rders.parquet")
      .groupBy(col("o_custkey"))
      .agg(
        max_by(struct(col("o_orderkey"), ms.as("ms"),
          expr("CAST(round(o_totalprice*100) AS BIGINT)").as("pc"),
          col("o_orderstatus")),
          struct(ms, col("o_orderkey"))).as("latest"),
        count(lit(1)).as("n_orders"))
    withStatePartitions(spark, 8) {
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.table(name)
      .select(col("o_custkey"),
        col("latest.o_orderkey").as("latest_orderkey"),
        col("latest.ms").as("latest_order_ms"),
        col("latest.pc").as("latest_price_c"),
        col("latest.o_orderstatus").as("latest_status"),
        col("n_orders"))
      .orderBy(col("o_custkey"))
  }

  final case class SessionState(startNs: Long, lastNs: Long, n: Long, sumC: Long)
  final case class SessionOut(user_id: Long, start_ns: Long, end_ns: Long, n_events: Long, sum_c: Long)

  /** Custom stateful streaming sessionization via
    * flatMapGroupsWithState (§2.8's KeyValueGroupedDataset path):
    * per-user state carries the open session across micro-batches; a
    * gap > `gapNs` closes and emits it. Events inside one micro-batch
    * are sorted by time (sources deliver them unordered). Input rows:
    * (user_id, ts_ns, value_c). */
  def sessionizeStateful(events: Dataset[(Long, Long, Long)],
      gapNs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val fn = (userId: Long, it: Iterator[(Long, Long, Long)], state: GroupState[SessionState]) => {
      val sorted = it.toArray.sortBy(_._2)
      val out = Seq.newBuilder[SessionOut]
      var st = state.getOption.orNull
      sorted.foreach { case (_, ts, vc) =>
        if (st == null) st = SessionState(ts, ts, 1L, vc)
        else if (ts - st.lastNs > gapNs) {
          out += SessionOut(userId, st.startNs, st.lastNs, st.n, st.sumC)
          st = SessionState(ts, ts, 1L, vc)
        } else st = SessionState(st.startNs, ts, st.n + 1, st.sumC + vc)
      }
      if (st != null) state.update(st)
      out.result().iterator
    }
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
