package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table — the streaming
  * twin of `graft.queries.EventsOps` (the reference itself is batch-only,
  * SURVEY.md §2.7; this is the extension layer the driver's events table
  * exists for).
  *
  * Each builder takes a streaming DataFrame (`spark.readStream`) and
  * returns the transformed streaming frame; sinks/triggers are the
  * caller's concern (tests drive them with a memory sink +
  * `processAllAvailable`, a real deployment writes parquet/Kafka with a
  * processing-time trigger).
  *
  * Scale: all three are watermark-bounded stateful operators — state is
  * keyed by (window, type) / (session, user) / event_id and evicted once
  * the watermark passes, so executor state stays O(active windows), not
  * O(stream history). Partitioning follows the groupBy keys; at 1000
  * executors the shuffle is the same hash exchange as the batch twin.
  */
object EventStreams {

  /** readStream entry for a directory of events parquet.
    *
    * FileStreamSource needs an explicit schema, but the `ts` flavor is
    * the upstream writer's choice — TIMESTAMP(NANOS) arrives as LongType
    * (under nanosAsLong), naive `timestamp[us]` as TIMESTAMP_NTZ, µs-UTC
    * as TimestampType. Peek the on-disk schema with a one-time
    * driver-side batch footer read (no data scan), then normalize `ts`
    * to TimestampType via the same flavor-proof boundary the batch path
    * uses ([[graft.Tables.normalizeEventTs]]) so every downstream
    * watermark/window operator sees one temporal type.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // An EMPTY source directory is a normal FileStreamSource start
    // condition (files arrive later) — fall back to the canonical
    // events schema (the µs-UTC flavor). The emptiness check is an
    // explicit file listing, NOT a catch of the peek's
    // AnalysisException: that exception also covers a nonexistent /
    // typo'd path, which must fail loudly here instead of starting a
    // permanently-empty stream. Caveat, stated rather than hidden: the
    // schema is fixed at stream definition, so if the FIRST files land
    // in a non-default flavor the stream must be restarted to re-peek —
    // normalizeEventTs below normalizes flavors seen at the peek, not
    // flavors that appear later.
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"events stream source directory does not exist: $dir")
    // ANY visible data file counts — not just *.parquet-suffixed ones
    // (Compaction.dirStats counts those): non-Spark writers produce
    // unsuffixed part files, and misclassifying a non-empty dir as
    // empty would silently pin the fallback schema over real files
    val hasFiles = {
      val it = fs.listFiles(path, /* recursive = */ true)
      var found = false
      while (!found && it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        found = st.isFile && !name.startsWith("_") && !name.startsWith(".")
      }
      found
    }
    val onDisk =
      if (hasFiles) spark.read.parquet(dir).schema else defaultSchema
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(onDisk).parquet(dir))
  }

  /** Canonical events schema (TESTDATA.md), used only when the source
    * directory has no files yet at stream start. `ts` is declared
    * TIMESTAMP_NTZ because that is the flavor the canonical fixture
    * writer produces (the r05+ driver fixtures — the whole reason
    * `Tables.normalizeTemporal` exists); declaring TimestampType here
    * would make the empty-start stream fail on the FIRST canonical
    * files to arrive. `normalizeEventTs` then casts NTZ→TimestampType,
    * so downstream sees the same type whichever path chose the schema.
    */
  private[streaming] val defaultSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour windows with a 10-minute watermark — the streaming
    * form of q10_events_hourly.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Built-in gap-based session windows (30 min), the streaming form of
    * q11_sessionize.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select(col("user_id"), col("n_events"), col("session_start"),
        col("session_end"))

  /** Watermarked streaming dedup on event_id — exactly-once-per-key
    * delivery over a replayed/at-least-once source.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming SRM monitor — the streaming twin of q191_srm_audit:
    * per 1-hour tumbling window, experiment-arm EVENT counts
    * (user_id % 2) and the two-arm chi-square statistic in exact
    * integer micro-units ((n₀−n₁)²·10⁶ div n, χ²₁ 95% cut at
    * 3.841459). A deploy that skews assignment mid-stream flips
    * `srm` within one window + watermark delay of the break — vs the
    * batch audit that finds it at the next pipeline run. Counts are
    * per-event (not per-user): streaming first-touch user dedup would
    * need unbounded state; the batch q191 owns the per-user form, and
    * an assignment break skews both the same way.
    */
  def srmMonitor(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_v0"))
      .select(col("window.start").as("hour"), col("n_events"), col("n_v0"),
        (col("n_events") - col("n_v0")).as("n_v1"))
      .withColumn("chi2_micro", expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * (n_v0 - n_v1) * (n_v0 - n_v1))" +
          " div n_events"))
      .withColumn("srm", col("chi2_micro") > lit(3841459L))

  final case class SessionEvent(user_id: Long, ts_us: Long, value: Double)
  final case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)
  final case class SessionOut(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, sum_value: Double)

  /** Custom stateful sessionizer via flatMapGroupsWithState — the
    * arbitrary-state API demo (KeyValueGroupedDataset surface). Emits a
    * session when a gap > 30 min closes it; event-time timeout flushes
    * idle sessions once the watermark passes.
    *
    * Per-group events arrive in no guaranteed order within a batch, so
    * the updater sorts each batch's buffer — state itself stays O(1) per
    * user (one open session).
    */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000000
    // keep the watermarked `ts` column in the frame — projecting it away
    // would strip the event-time watermark the timeout relies on
    val typed = events
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .withWatermark("ts", "1 hour")
      .as[SessionEvent]

    val update = (user: Long, batch: Iterator[SessionEvent],
        state: GroupState[SessionState]) => {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(user, s.startUs, s.lastUs, s.n, s.sum))
      } else {
        val sorted = batch.toSeq.sortBy(_.ts_us)
        var cur = state.getOption.orNull
        val closed = Seq.newBuilder[SessionOut]
        sorted.foreach { e =>
          if (cur == null) {
            cur = SessionState(e.ts_us, e.ts_us, 1L, e.value)
          } else if (e.ts_us - cur.lastUs > gapUs) {
            closed += SessionOut(user, cur.startUs, cur.lastUs, cur.n, cur.sum)
            cur = SessionState(e.ts_us, e.ts_us, 1L, e.value)
          } else {
            cur = SessionState(cur.startUs, e.ts_us, cur.n + 1, cur.sum + e.value)
          }
        }
        if (cur != null) {
          state.update(cur)
          state.setTimeoutTimestamp(cur.lastUs / 1000 + gapUs / 1000)
        }
        closed.result().iterator
      }
    }

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
      .toDF()
  }

  /** Stream-stream interval join: purchases within 30 minutes after a
    * click by the same user. Both sides carry watermarks so the join
    * state (buffered clicks awaiting purchases and vice versa) is evicted
    * once event time passes — bounded state, the requirement for a
    * stream-stream join to run indefinitely.
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases, expr(
      """user_id = p_user
        |AND purchase_ts >= click_ts
        |AND purchase_ts <= click_ts + INTERVAL 30 MINUTES""".stripMargin))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  /** Spark 4 `transformWithState` (state API v2) demo: per-user running
    * totals with typed ValueState, emitted on every update. Requires the
    * RocksDB state store provider (set by [[withRocksDBStateStore]]) —
    * the provider that scales keyed state past executor heap via native
    * memory + changelog checkpointing.
    */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, SessionEvent, UserTotals] {
    import org.apache.spark.sql.{Encoders => E}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      state = getHandle.getValueState(
        "totals", E.tuple(E.scalaLong, E.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        inputRows: Iterator[SessionEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotals] = {
      var (n, sum) = if (state.exists()) state.get() else (0L, 0.0)
      inputRows.foreach { e => n += 1; sum += e.value }
      state.update((n, sum))
      Iterator(UserTotals(key, n, sum))
    }
  }

  /** Session configuration for transformWithState (RocksDB-backed). */
  def withRocksDBStateStore(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  final case class SpikeEvent(event_type: String, ts_us: Long)
  final case class SpikeState(
      pendingHours: Map[Long, Long], flushedTail: Vector[(Long, Long)])
  final case class SpikeOut(
      event_type: String, hour_us: Long, n_events: Long,
      trailing_events: Option[Long], spike_permille: Option[Long])

  /** Streaming rate-spike detection — the streaming twin of
    * q106_rate_spikes: per event_type, each hour's volume scored against
    * the trailing 3 FLUSHED hours, `(n·1000) div trailing` (None until a
    * trailing window exists — same contract as the batch NULL).
    *
    * State per type is O(unflushed hours + 3): pending hour counts
    * accumulate until the watermark passes an hour's END (hours are then
    * immutable — late events land inside the watermark by construction),
    * the hour flushes in order, and only the last 3 flushed (hour,
    * count) pairs are retained for trailing sums. Flush is driven by
    * event-time timeouts: the no-data batch Spark runs when the
    * watermark advances fires the timeout, so hours emit without
    * waiting for the next event of that type.
    */
  def rateSpikes(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val HourUs = 3600L * 1000000
    val typed = events
      .select(col("event_type"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .withWatermark("ts", "10 minutes")
      .as[SpikeEvent]

    val update = (key: String, batch: Iterator[SpikeEvent],
        state: GroupState[SpikeState]) => {
      val wmUs = state.getCurrentWatermarkMs() * 1000
      var st = state.getOption.getOrElse(SpikeState(Map.empty, Vector.empty))
      val newCounts = batch.foldLeft(Map.empty[Long, Long]) { (m, e) =>
        val h = e.ts_us - java.lang.Math.floorMod(e.ts_us, HourUs)
        m.updated(h, m.getOrElse(h, 0L) + 1L)
      }
      val pending = newCounts.foldLeft(st.pendingHours) { case (m, (h, n)) =>
        m.updated(h, m.getOrElse(h, 0L) + n)
      }
      val (ready, still) = pending.partition { case (h, _) => h + HourUs <= wmUs }
      var tail = st.flushedTail
      val out = ready.toSeq.sortBy(_._1).map { case (h, n) =>
        val trailing = if (tail.isEmpty) None else Some(tail.map(_._2).sum)
        tail = (tail :+ (h, n)).takeRight(3)
        SpikeOut(key, h, n, trailing,
          trailing.filter(_ > 0).map(t => n * 1000 / t))
      }
      st = SpikeState(still, tail)
      if (st.pendingHours.nonEmpty || st.flushedTail.nonEmpty) {
        state.update(st)
        if (st.pendingHours.nonEmpty)
          state.setTimeoutTimestamp(st.pendingHours.keys.min / 1000 + HourUs / 1000)
      } else state.remove()
      out.iterator
    }

    typed
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
      .toDF()
      .select(col("event_type"), timestamp_micros(col("hour_us")).as("hour"),
        col("n_events"), col("trailing_events"), col("spike_permille"))
  }

  /** Per-user running totals via the state API v2. */
  def runningTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    withRocksDBStateStore(spark)
    events
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
      .toDF()
  }
}
