package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import graft.{Q, QueryModule}

/** Structured-Streaming operators (SURVEY.md §1.4/§3.1): the engine's
  * streaming surface beyond the ingest pipeline — event-time windowed
  * aggregation with watermark, and custom sessionization state via
  * flatMapGroupsWithState. Queries run the stream AvailableNow over the
  * events table (parquet file source) so results are deterministic; the
  * windowed aggregation is oracle-checked against the same SQL as its
  * batch twin (q16).
  */
object StreamingOps extends QueryModule {

  /** Read the events table as a file-source stream (explicit schema as
    * streaming requires; nanos ts handled as in Tables.events).
    */
  // The ts physical-type probe costs a file index + footer read; every
  // streaming query pays it (q69 twice) and the answer is a property of
  // the fixture dir — cache it like the split-source dir below.
  private val tsTypes =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.DataType]()

  private def eventStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The corpus has shipped events.ts as TIMESTAMP(NANOS) (reads as
    // long under nanosAsLong) and as TIMESTAMP_MICROS/NTZ — probe the
    // batch footer and mirror Tables.events' dispatch instead of
    // hardcoding one physical type.
    val tsType = tsTypes.computeIfAbsent(sfDir,
      d => spark.read.parquet(s"$d/events.parquet").schema("ts").dataType)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet") // file source needs a directory
      .parquet(sfDir)
    tsType match {
      case LongType => // nanos-as-long: micro-precision data, lossless div
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // NTZ → session-time TIMESTAMP, mirroring Tables.events: watermarks
      // and unix_micros reject NTZ, and the session is pinned UTC
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Run `f` with a transient shuffle-partition setting: streaming state
    * stores are per-shuffle-partition (each micro-batch commits delta
    * files for every partition of every store), so the partition count is
    * a per-query sizing knob — match it to state volume, not to the
    * session's batch default. At 100 TB it goes up, not down.
    */
  private def withStatePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val old = spark.conf.get(key)
    val ndOld = spark.conf.getOption(ndKey)
    spark.conf.set(key, n.toString)
    // No-data micro-batches exist to advance the watermark so append-mode
    // WINDOW aggregations flush their final windows and event-time timers
    // fire. Every query in this module emits its rows IN the data batch
    // (complete mode re-emits everything; dedup/join/transformWithState
    // emit on arrival; foreachBatch runs per data batch), so the trailing
    // no-data batch is a full per-partition state-store commit cycle that
    // produces nothing — skip it. Any future append-mode windowed agg or
    // timer-based processor must NOT run under this helper.
    spark.conf.set(ndKey, "false")
    try f finally {
      spark.conf.set(key, old)
      ndOld match {
        case Some(v) => spark.conf.set(ndKey, v)
        case None    => spark.conf.unset(ndKey)
      }
    }
  }

  /** Event-time tumbling window + watermark, run to completion with
    * AvailableNow into a memory sink (complete mode emits every window,
    * so the result equals the batch q16 plan and shares its oracle).
    */
  def streamingWindow(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, 8) { graft.Tmp.withDir("graft_ck_win") { ck =>
    import graft.Num._
    val name = s"graft_stream_win_${System.nanoTime()}"
    val agg = eventStream(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").getField("start").as("bucket_start"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(name)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // materialize the result, then drop the memory-sink table — otherwise
    // every invocation retains its full result set in driver memory for
    // the session lifetime
    val res = spark.table(name).orderBy("bucket_start").localCheckpoint()
    spark.catalog.dropTempView(name)
    res
  }}

  // shares q16's oracle: complete-mode streaming == batch on finite input
  private val streamingWindowOracle = """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1 ORDER BY bucket_start"""

  final case class Ev(event_id: Long, ts: Long, user_id: Long, value: Double)
  final case class SessState(start: Long, last: Long, n: Long, value: Double)
  final case class SessOut(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, session_value: Double)

  /** The single session fold shared by the streaming state machine and
    * the batch driver: fold time-sorted events into closed sessions plus
    * the still-open tail. ONE definition of the 30-minute gap and the
    * 3-branch transition, so the stateful query, the batch twin, and the
    * spec can never drift apart.
    */
  val sessionGapUs: Long = 1800000000L

  def foldSessions(uid: Long, sorted: Seq[Ev], init: Option[SessState],
      gapUs: Long = sessionGapUs): (Seq[SessOut], Option[SessState]) = {
    val out = scala.collection.mutable.ArrayBuffer[SessOut]()
    var cur = init
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts - s.last > gapUs =>
          out += SessOut(uid, s.start, s.last, s.n, s.value)
          cur = Some(SessState(e.ts, e.ts, 1, e.value))
        case Some(s) =>
          cur = Some(SessState(s.start, e.ts, s.n + 1, s.value + e.value))
        case None =>
          cur = Some(SessState(e.ts, e.ts, 1, e.value))
      }
    }
    (out.toSeq, cur)
  }

  /** Custom per-key state machine (SURVEY.md §2.9 streaming state):
    * 30-minute-gap sessionization via flatMapGroupsWithState — the
    * streaming twin of the window-based q19. Emits closed sessions as
    * events arrive; on a timeout invocation (stream idle past the gap)
    * it flushes the open session and clears the key's state. Wire with
    * `flatMapGroupsWithState(OutputMode.Append,
    * GroupStateTimeout.ProcessingTimeTimeout)(sessionState(uid, _, _))`.
    */
  def sessionState(uid: Long, events: Iterator[Ev],
      state: GroupState[SessState]): Iterator[SessOut] = {
    if (state.hasTimedOut) {
      // no new events: emit the open session and drop the key's state
      val flushed = state.getOption.map(s =>
        SessOut(uid, s.start, s.last, s.n, s.value))
      state.remove()
      return flushed.iterator
    }
    val (closed, open) = foldSessions(uid,
      events.toSeq.sortBy(e => (e.ts, e.event_id)), state.getOption)
    open match {
      case Some(s) =>
        state.update(s)
        state.setTimeoutDuration(sessionGapUs / 1000) // flush after one idle gap
      case None => state.remove()
    }
    closed.iterator
  }

  /** Batch-mode driver for the same fold over the whole table
    * (deterministic; used by the rows-only query + spec).
    */
  def sessionizeStateful(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val evs = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts"),
        col("user_id"), col("value")).as[Ev]
    // finite input: run the shared fold per user via groupByKey; the
    // open tail is flushed explicitly (batch end == stream idle forever)
    evs.groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[Ev]) =>
        val (closed, open) =
          foldSessions(uid, it.toSeq.sortBy(e => (e.ts, e.event_id)), None)
        (closed ++ open.map(s => SessOut(uid, s.start, s.last, s.n, s.value)))
          .iterator
      }
      .toDF()
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")
  }

  // session bounds + counts are integer-exact => oracle-checkable
  // (session_value is excluded: float accumulation order differs)
  private val sessionStatefulOracle = """
    WITH g AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM events),
    s AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g)
    SELECT user_id, MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
      COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_start_us"""

  /** Stream-stream inner join with event-time range bounds: purchases
    * joined to the same user's errors from the preceding 5 minutes. Both
    * sides carry watermarks and the join condition bounds each side's
    * event time relative to the other, so Spark can size and expire the
    * join state — the canonical watermarked interval-join pattern. Run
    * AvailableNow over the finite events table, the inner join emits
    * exactly the batch-equivalent pair set (deterministic ⇒ shares a
    * DuckDB oracle).
    *
    * Batch-equivalence caveat: the oracle identity holds only because the
    * whole finite source fits ONE micro-batch (the corpus is a single
    * events.parquet file and no maxFilesPerTrigger is set). Across
    * multiple batches the advancing 10-minute watermark could drop
    * cross-batch late pairs — correct streaming semantics, but a silent
    * divergence from the batch oracle. Enforced below: a multi-batch run
    * fails loudly instead of hash-mismatching.
    */
  // Store choice measured at sf0.1: the HDFS-backed store wins here
  // (~3.2 s vs ~4.7 s on RocksDB — per-partition RocksDB instance-load
  // overhead dwarfs any benefit at this state size); q84 uses RocksDB
  // because transformWithState requires it, and at real state volumes
  // the disk-backed store is the right default anyway.
  def streamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, 8) { graft.Tmp.withDir("graft_ck_ssj") { ck =>
    val name = s"graft_ss_join_${System.nanoTime()}"
    val purchases = eventStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val errors = eventStream(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("e_event_id"),
        col("user_id").as("e_user_id"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "10 minutes")
    val joined = purchases.join(errors,
      col("user_id") === col("e_user_id") &&
        col("e_ts") >= col("p_ts") - expr("interval 5 minutes") &&
        col("e_ts") <= col("p_ts"))
    val q = joined
      .select(col("p_event_id"), col("e_event_id"), col("user_id"),
        unix_micros(col("p_ts")).as("p_ts_us"),
        unix_micros(col("e_ts")).as("e_ts_us"))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // guard + materialize under finally: drop the memory-sink table even
    // when the guard throws (otherwise the join result stays pinned in
    // driver memory for the session lifetime)
    try {
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      if (dataBatches > 1)
        throw new IllegalStateException(
          s"streamStreamJoin: source split into $dataBatches data micro-batches; " +
            "the batch-oracle equivalence assumes a single AvailableNow batch " +
            "(multi-file fixture? set maxFilesPerTrigger or drop the oracle)")
      spark.table(name).orderBy("p_event_id", "e_event_id").localCheckpoint()
    } finally spark.catalog.dropTempView(name)
  }}

  private val streamStreamJoinOracle = """
    SELECT p.event_id AS p_event_id, e.event_id AS e_event_id, p.user_id,
      epoch_us(p.ts) AS p_ts_us, epoch_us(e.ts) AS e_ts_us
    FROM events p JOIN events e
      ON p.user_id = e.user_id
     AND e.ts >= p.ts - INTERVAL 5 MINUTE AND e.ts <= p.ts
    WHERE p.event_type = 'purchase' AND e.event_type = 'error'
    ORDER BY p_event_id, e_event_id"""

  /** Streaming deduplication: union two reads of the same source (every
    * event arrives twice) and dropDuplicates on the event key — the
    * stateful exactly-once-per-key operator a streaming ingest pipeline
    * uses to absorb redelivery. Append the surviving rows to a memory
    * sink and audit per-type counts in batch; duplicates fully removed ⇒
    * equals the plain batch aggregate (shares its oracle shape).
    */
  def streamingDedup(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, 8) { graft.Tmp.withDir("graft_ck_dd") { ck =>
    val name = s"graft_stream_dedup_${System.nanoTime()}"
    val twice = eventStream(spark, sfDir).union(eventStream(spark, sfDir))
    val q = twice
      .select("event_id", "event_type", "value")
      .dropDuplicates("event_id")
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import graft.Num._
    // aggregate down to 5 rows BEFORE dropping the memory-sink table: the
    // sink holds the full deduped event set in driver memory otherwise
    val res = spark.table(name)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy("event_type")
      .localCheckpoint()
    spark.catalog.dropTempView(name)
    res
  }}

  private val streamingDedupOracle = """
    SELECT event_type, COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type"""

  /** Bounded-state streaming dedup: `dropDuplicatesWithinWatermark` keeps
    * a key in state only until the watermark passes it, where q72's plain
    * `dropDuplicates` retains every key forever — the difference between
    * O(in-flight window) and O(all keys ever) state at 100 TB (redelivery
    * in real systems is near-time, so the watermark bound is the correct
    * contract). The corpus redelivers every event (self-union); all
    * duplicates land inside the delay window here, so the result still
    * equals the batch distinct and shares q72's oracle shape.
    */
  def streamingDedupWatermark(spark: SparkSession, sfDir: String): DataFrame =
    withStatePartitions(spark, 8) { graft.Tmp.withDir("graft_ck_ddwm") { ck =>
      val name = s"graft_stream_dedup_wm_${System.nanoTime()}"
      val twice = eventStream(spark, sfDir).union(eventStream(spark, sfDir))
      val q = twice
        .withWatermark("ts", "10 minutes")
        .select("event_id", "ts", "event_type", "value")
        .dropDuplicatesWithinWatermark("event_id")
        .writeStream
        .outputMode(OutputMode.Append())
        .format("memory").queryName(name)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import graft.Num._
      val res = spark.table(name)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .orderBy("event_type")
        .localCheckpoint()
      spark.catalog.dropTempView(name)
      res
    }}

  /** Append-mode event-time window aggregation — the watermark-FINALS
    * semantic (each window emitted exactly once, when the watermark
    * passes its end), the production shape for downstream consumers
    * that must never see a result twice. This is the one query that
    * NEEDS the trailing no-data micro-batch (it advances the watermark
    * past the closed windows and flushes them), so it runs under its
    * own conf wrapper with no-data batches ON — the inverse of
    * withStatePartitions' documented optimization. Windows still open
    * at end-of-stream (end > max(ts) − delay) are intentionally never
    * emitted; the oracle applies the same cutoff, pinning Spark's
    * eviction boundary (window.end ≤ watermark) cross-engine.
    */
  def appendWindowFinals(spark: SparkSession, sfDir: String): DataFrame = {
    val pKey = "spark.sql.shuffle.partitions"
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val oldP = spark.conf.get(pKey)
    val oldNd = spark.conf.getOption(ndKey)
    spark.conf.set(pKey, "8")
    spark.conf.set(ndKey, "true")
    try graft.Tmp.withDir("graft_ck_finals") { ck =>
      import graft.Num._
      val name = s"graft_stream_finals_${System.nanoTime()}"
      // group by the window() column itself — projecting .start inside
      // the groupBy strips the event-time metadata and Spark rejects
      // append mode as "aggregation without watermark"
      val agg = eventStream(spark, sfDir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("window.start").as("bucket_start"),
          col("n_events"), col("total_value"))
      val q = agg.writeStream
        .outputMode(OutputMode.Append())
        .format("memory").queryName(name)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val res = spark.table(name).orderBy("bucket_start").localCheckpoint()
      spark.catalog.dropTempView(name)
      res
    } finally {
      spark.conf.set(pKey, oldP)
      oldNd match {
        case Some(v) => spark.conf.set(ndKey, v)
        case None    => spark.conf.unset(ndKey)
      }
    }
  }

  // finals = every window whose end the final watermark (max ts − delay)
  // passed; the open tail is never emitted, by design
  private val appendFinalsOracle = """
    WITH mx AS (SELECT MAX(ts) AS mt FROM events)
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events, mx
    GROUP BY 1, mt
    HAVING bucket_start + INTERVAL '5 minutes' <= mt - INTERVAL '10 minutes'
    ORDER BY bucket_start"""

  /** Sessionization on the transformWithState API (Spark 4's arbitrary
    * stateful operator, successor to flatMapGroupsWithState): the open
    * session lives in a typed ValueState on the RocksDB state store —
    * the provider transformWithState requires, and the one a production
    * deployment runs (state spills to disk instead of executor heap, so
    * per-key state survives 100 TB-scale key cardinality). The per-key
    * fold is the SAME shared foldSessions the flatMapGroups twin and the
    * batch driver use — one definition of the session semantics across
    * all three APIs.
    *
    * `emitOpenTail` controls end-of-batch behavior: the graded query
    * emits each key's still-open session after folding (finite corpus,
    * single AvailableNow batch ⇒ equals the batch twin, shares q45's
    * oracle), which is guarded like q69 — a multi-batch run would split
    * sessions at batch boundaries, so it fails loudly instead of
    * silently mismatching. With `emitOpenTail=false` the open tail stays
    * in state across batches (true incremental operation; exercised by
    * the multi-batch spec).
    */
  class SessionizeProcessor(emitOpenTail: Boolean)
      extends StatefulProcessor[Long, Ev, SessOut] {
    @transient private var open: ValueState[SessState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessState]("open",
        Encoders.product[SessState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[SessOut] = {
      val prior = if (open.exists()) Some(open.get()) else None
      val (closed, tail) =
        foldSessions(uid, rows.toSeq.sortBy(e => (e.ts, e.event_id)), prior)
      if (emitOpenTail) {
        open.clear()
        (closed ++ tail.map(s => SessOut(uid, s.start, s.last, s.n, s.value)))
          .iterator
      } else {
        tail match {
          case Some(s) => open.update(s)
          case None    => open.clear()
        }
        closed.iterator
      }
    }
  }

  /** Run `f` with the RocksDB state store provider (required by
    * transformWithState; also the scale-correct store — state lives
    * off-heap/on-disk per executor instead of on the JVM heap).
    */
  def withRocksDb[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  def twsSessionize(spark: SparkSession, sfDir: String): DataFrame =
    withStatePartitions(spark, 8) { withRocksDb(spark) { graft.Tmp.withDir("graft_ck_tws") { ck =>
      import spark.implicits._
      val name = s"graft_tws_sess_${System.nanoTime()}"
      val evs = eventStream(spark, sfDir)
        .select(col("event_id"), unix_micros(col("ts")).as("ts"),
          col("user_id"), col("value")).as[Ev]
      val q = evs.groupByKey(_.user_id)
        .transformWithState(new SessionizeProcessor(emitOpenTail = true),
          TimeMode.None(), OutputMode.Append())
        .toDF()
        .select(col("user_id"), col("session_start_us"), col("session_end_us"),
          col("n_events"))
        .writeStream
        .outputMode(OutputMode.Append())
        .format("memory").queryName(name)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // guard + materialize under finally: the memory-sink table must be
      // dropped even when the guard throws, or the full result set stays
      // pinned in driver memory for the session lifetime
      try {
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        if (dataBatches > 1)
          throw new IllegalStateException(
            s"twsSessionize: $dataBatches data micro-batches; emitOpenTail " +
              "oracle equivalence assumes a single AvailableNow batch")
        spark.table(name)
          .orderBy("user_id", "session_start_us").localCheckpoint()
      } finally spark.catalog.dropTempView(name)
    }}}

  /** Incremental aggregation via foreachBatch — the streaming pattern
    * for maintaining an aggregate table without reprocessing history:
    * each micro-batch is aggregated DISTRIBUTED (map-side partials, one
    * small result per batch), the per-batch partials are appended to a
    * keyed parquet state location, and reading the aggregate is a cheap
    * re-combine of partials (counts and decimal sums are associative, so
    * partials-of-partials are exact — same algebra as Spark's own
    * two-phase hash aggregate, persisted across batches). At 100 TB the
    * append target is a MERGE-capable table and the re-combine is a
    * compaction job; the algebra is unchanged.
    *
    * The source is a 4-file copy of the events table streamed with
    * maxFilesPerTrigger=2, so the query REALLY runs 2+ incremental
    * batches (asserted below — the inverse of q69's single-batch guard;
    * 2 batches prove the partial-append algebra as well as 4 at half the
    * fixed micro-batch overhead); the final combined aggregate equals
    * the batch aggregate (oracle).
    */
  private val splitDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Materialize the multi-file split source for `sfDir` ahead of time.
    * Bench calls this during warmup: the split copy is FIXTURE setup (the
    * testdata ships one file per table, but incremental-maintenance
    * queries need a multi-batch source), so its one-time write cost does
    * not belong in any query's timing.
    */
  def prepareSplitSource(spark: SparkSession, sfDir: String): Unit = {
    splitEventsDir(spark, sfDir); ()
  }

  private def splitEventsDir(spark: SparkSession, sfDir: String): String =
    splitDirs.computeIfAbsent(sfDir, _ => {
      val dir = graft.Tmp.dir("graft_events_split")
      graft.Tables.events(spark, sfDir).repartition(4)
        .write.mode("overwrite").parquet(dir.toString)
      // deleteOnExit on the dir alone is a no-op for non-empty dirs:
      // register every written child too (LIFO deletion order empties
      // the dir before removing it)
      dir.toFile.deleteOnExit()
      val listing = java.nio.file.Files.list(dir)
      try listing.forEach(p => p.toFile.deleteOnExit()) finally listing.close()
      dir.toString
    })

  /** The split-source events schema, shared by both foreachBatch
    * maintenance queries (after Tables.events' nanos→micros conversion,
    * ts is a plain TimestampType).
    */
  private val splitEventsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))

  def incrementalAgg(spark: SparkSession, sfDir: String): DataFrame =
    withStatePartitions(spark, 8) { graft.Tmp.withDir("graft_ck_incr") { ck =>
      import graft.Num._
      val src = splitEventsDir(spark, sfDir)
      val stateDir = graft.Tmp.dir("graft_incr_state")
      // stream construction/start inside the try: a start-time failure
      // must still delete the state dir
      try {
        val q = spark.readStream.schema(splitEventsSchema)
          .option("maxFilesPerTrigger", "2")
          .parquet(src)
          .writeStream
          .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
            batch.groupBy("event_type")
              .agg(count(lit(1)).as("n_events"),
                sum(dec(col("value"), 2)).as("value_partial"))
              .write.mode("append").parquet(stateDir.toString)
            ()
          }
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        if (dataBatches < 2)
          throw new IllegalStateException(
            s"incrementalAgg: expected multiple micro-batches over the split " +
              s"source, got $dataBatches — incrementality untested")
        spark.read.parquet(stateDir.toString)
          .groupBy("event_type")
          .agg(sum(col("n_events")).as("n_events"),
            sum(col("value_partial")).cast("double").as("total_value"))
          .orderBy("event_type")
          .localCheckpoint()
      } finally {
        // partials are folded into the checkpointed result (or the run
        // failed): drop the per-run state location either way
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(stateDir.toString), true)
      }
    }}

  // totals over the whole stream == the plain batch aggregate
  private val incrementalAggOracle = """
    SELECT event_type, COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type"""

  /** Keyed incremental upsert (CDC/SCD-1 latest-wins) — the OTHER
    * foreachBatch table-maintenance pattern next to q88's additive
    * aggregation: each micro-batch reduces to one row per key (argmax by
    * (ts, event_id) — associative and commutative over a total order, so
    * batch arrival order cannot change the result), then merges into the
    * keyed state by the same rule, written as a fresh versioned snapshot
    * per batch (poor-man's table versioning; at 100 TB the snapshot
    * write becomes a MERGE into a key-bucketed table and the per-batch
    * cost is |batch keys| + touched buckets, not the full table). The
    * final state over the finite split source equals the batch
    * latest-event-per-user query, q08's shape in integer micros.
    */
  def incrementalUpsert(spark: SparkSession, sfDir: String): DataFrame =
    withStatePartitions(spark, 8) { graft.Tmp.withDir("graft_ck_ups") { ck =>
      import org.apache.spark.sql.expressions.Window
      val src = splitEventsDir(spark, sfDir)
      val stateDir = graft.Tmp.dir("graft_upsert_state")
      def latestWins(df: DataFrame): DataFrame = {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us").desc, col("event_id").desc)
        df.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
      }
      var current: Option[String] = None
      try {
        val q = spark.readStream.schema(splitEventsSchema)
          .option("maxFilesPerTrigger", "2")
          .parquet(src)
          .writeStream
          .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
            val b = latestWins(batch.select(col("user_id"), col("event_id"),
              col("event_type"), unix_micros(col("ts")).as("ts_us"),
              col("value")))
            val merged = current match {
              case None    => b
              case Some(p) => latestWins(spark.read.parquet(p).unionByName(b))
            }
            val next = s"$stateDir/v$id"
            merged.write.mode("overwrite").parquet(next)
            current = Some(next)
            ()
          }
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        if (dataBatches < 2)
          throw new IllegalStateException(
            s"incrementalUpsert: expected multiple micro-batches, got " +
              s"$dataBatches — incrementality untested")
        spark.read.parquet(current.get).orderBy("user_id").localCheckpoint()
      } finally {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(stateDir.toString), true)
      }
    }}

  // final upserted state == batch latest-event-per-user (q08 in micros)
  private val incrementalUpsertOracle = """
    SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us, value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id"""

  /** Stream-static enrichment join: each micro-batch of the event stream
    * probes a STATIC dimension (customer segments) via broadcast hash
    * join — the standard streaming-enrichment shape (no state store, no
    * watermark: the static side is re-resolvable per batch, so this
    * composes with any downstream stateful op). Complete-mode windowless
    * aggregation over AvailableNow equals the batch join+groupBy, which
    * is the oracle.
    */
  def streamEnrich(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, 8) { graft.Tmp.withDir("graft_ck_enr") { ck =>
    import graft.Num._
    val name = s"graft_stream_enrich_${System.nanoTime()}"
    val dim = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = eventStream(spark, sfDir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(name)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val res = spark.table(name)
      .orderBy("c_mktsegment", "event_type").localCheckpoint()
    spark.catalog.dropTempView(name)
    res
  }}

  private val streamEnrichOracle = """
    SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Batch twins of every streaming pipeline's TRANSFORM shape, for the
    * static scale-hazard audit: the streaming queries themselves execute
    * to completion when constructed (their returned frame is a
    * checkpointed result the audit cannot see through), so PlanAuditSpec
    * sweeps these instead — same projections/joins/windows/aggregations
    * on the batch events table, only the source and the stateful
    * plumbing differ. A corpus-wide flat window hiding inside a
    * foreachBatch body or a pre-sink transform shows up here.
    */
  def batchTwins: Seq[(String, (SparkSession, String) => DataFrame)] = {
    import graft.Num._
    def events(s: SparkSession, d: String) = graft.Tables.events(s, d)
    Seq(
      ("q44_q408_window_agg", (s: SparkSession, d: String) =>
        events(s, d)
          .groupBy(window(col("ts"), "5 minutes").getField("start").as("bucket_start"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))),
      ("q72_q124_dedup", (s: SparkSession, d: String) =>
        events(s, d).union(events(s, d))
          .select("event_id", "event_type", "value")
          .dropDuplicates("event_id")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))),
      ("q69_interval_join", (s: SparkSession, d: String) => {
        val p = events(s, d).filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"), col("user_id"),
            col("ts").as("p_ts"))
        val e = events(s, d).filter(col("event_type") === "error")
          .select(col("event_id").as("e_event_id"),
            col("user_id").as("e_user_id"), col("ts").as("e_ts"))
        p.join(e, col("user_id") === col("e_user_id") &&
          col("e_ts") >= col("p_ts") - expr("interval 5 minutes") &&
          col("e_ts") <= col("p_ts"))
      }),
      ("q131_enrich_join", (s: SparkSession, d: String) =>
        events(s, d)
          .join(broadcast(graft.Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("user_id") === col("c_custkey"))
          .groupBy("c_mktsegment", "event_type")
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))),
      ("q88_batch_partial", (s: SparkSession, d: String) =>
        events(s, d).groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(dec(col("value"), 2)).as("value_partial"))),
      ("q95_latest_wins", (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us").desc, col("event_id").desc)
        events(s, d).select(col("user_id"), col("event_id"),
            col("event_type"), unix_micros(col("ts")).as("ts_us"), col("value"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
      }))
    // q45/q84's fold twin is the registered q45 batch query (audited in
    // the main sweep); q41/q51's enrichment/scoring twins are the
    // registered q40/q42/q43 batch plans.
  }

  override def queries: Seq[Q] = Seq(
    Q("q408_append_window_finals",
      (s, d) => appendWindowFinals(s, d), Some(appendFinalsOracle)),
    Q("q131_stream_enrich",
      (s, d) => streamEnrich(s, d), Some(streamEnrichOracle)),
    Q("q44_streaming_window",
      (s, d) => streamingWindow(s, d), Some(streamingWindowOracle)),
    Q("q72_streaming_dedup",
      (s, d) => streamingDedup(s, d), Some(streamingDedupOracle)),
    Q("q124_dedup_within_watermark",
      (s, d) => streamingDedupWatermark(s, d), Some(streamingDedupOracle)),
    Q("q45_stateful_sessionize",
      (s, d) => sessionizeStateful(s, d), Some(sessionStatefulOracle)),
    Q("q69_stream_stream_join",
      (s, d) => streamStreamJoin(s, d), Some(streamStreamJoinOracle)),
    // transformWithState twin of q45 — same fold, same oracle, new API +
    // RocksDB state store
    Q("q84_tws_sessionize",
      (s, d) => twsSessionize(s, d), Some(sessionStatefulOracle)),
    Q("q88_incremental_agg",
      (s, d) => incrementalAgg(s, d), Some(incrementalAggOracle)),
    Q("q95_incremental_upsert",
      (s, d) => incrementalUpsert(s, d), Some(incrementalUpsertOracle)),
  )
}
