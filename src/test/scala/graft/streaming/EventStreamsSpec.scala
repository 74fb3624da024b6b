package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Drives each streaming operator synchronously over the sf0.001 events
  * parquet with a memory sink, and cross-checks results against the
  * equivalent batch computation — the streaming/batch parity contract.
  */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** FileStreamSource requires a directory; stage the single events
    * parquet file into one.
    */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("part-00000.parquet"))
    d.toString
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  private def batchEvents() = graft.Tables.loadEvents(spark, dir)

  test("readEvents starts on an EMPTY source directory (schema fallback)") {
    // normal FileStreamSource condition: the directory exists but files
    // arrive later — the batch schema peek must not kill the stream
    val empty = java.nio.file.Files.createTempDirectory("events_empty").toString
    val s = EventStreams.readEvents(spark, empty)
    assert(s.isStreaming)
    // the fallback schema declares ts NTZ (the canonical fixture
    // flavor); post-normalize the stream presents TimestampType —
    // identical to what the non-empty peek path presents
    assert(s.schema.fieldNames.sameElements(
      EventStreams.defaultSchema.fieldNames))
    assert(s.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    runToMemory(EventStreams.hourlyCounts(s), "empty_start")
    assert(spark.table("empty_start").count() == 0)
  }

  test("empty-start stream reads canonical-flavor files that arrive later") {
    // the fallback schema must match what the lake's writer actually
    // produces (NTZ since the r05 fixtures): declare-TimestampType
    // would fail on the FIRST canonical file to land after start
    val d = java.nio.file.Files.createTempDirectory("events_late")
    val s = EventStreams.readEvents(spark, d.toString)
    // file named WITHOUT .parquet suffix: the non-empty probe must
    // count unsuffixed data files too (non-Spark writers produce them)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("part-00000"))
    runToMemory(EventStreams.hourlyCounts(s), "late_arrivals", mode = "complete")
    val got = spark.sql("select sum(n_events) from late_arrivals")
      .head().getLong(0)
    assert(got == batchEvents().count())
    // and a restart NOW (files present, unsuffixed) peeks the real
    // schema instead of misreading the dir as empty
    val restarted = EventStreams.readEvents(spark, d.toString)
    assert(restarted.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("hourly counts match the batch aggregation") {
    val stream = EventStreams.readEvents(spark, streamDir)
    runToMemory(EventStreams.hourlyCounts(stream), "hourly", mode = "complete")
    val got = spark.sql("select sum(n_events) from hourly").head().getLong(0)
    assert(got == batchEvents().count())
  }

  test("session windows cover every event exactly once") {
    val stream = EventStreams.readEvents(spark, streamDir)
    runToMemory(EventStreams.sessionWindows(stream), "sessions", mode = "complete")
    val got = spark.sql("select sum(n_events) from sessions").head().getLong(0)
    assert(got == batchEvents().count())
  }

  test("streaming dedup keeps one row per event_id") {
    val stream = EventStreams.readEvents(spark, streamDir)
    runToMemory(EventStreams.dedupedEvents(stream), "deduped")
    val n = spark.sql("select count(distinct event_id) from deduped").head().getLong(0)
    val total = spark.sql("select count(*) from deduped").head().getLong(0)
    assert(n == total)
  }

  test("stream-stream interval join matches the batch join") {
    val stream = EventStreams.readEvents(spark, streamDir)
    runToMemory(EventStreams.clickPurchaseJoin(stream), "cp_join")
    val got = spark.sql("select count(*) from cp_join").head().getLong(0)
    val ev = batchEvents()
    val clicks = ev.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .selectExpr("user_id", "event_id as click_id", "ts as click_ts")
    val purchases = ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("user_id as p_user", "event_id as purchase_id", "ts as purchase_ts")
    val expected = clicks.join(purchases, org.apache.spark.sql.functions.expr(
      "user_id = p_user AND purchase_ts >= click_ts AND purchase_ts <= click_ts + INTERVAL 30 MINUTES"))
      .count()
    assert(got == expected && got > 0)
  }

  test("streaming SRM monitor matches the batch per-hour arm counts bit-for-bit") {
    val stream = EventStreams.readEvents(spark, streamDir)
    runToMemory(EventStreams.srmMonitor(stream), "srm", mode = "complete")
    val got = spark.sql(
      "select unix_micros(hour) as h, n_events, n_v0, n_v1, chi2_micro, srm from srm")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    val expected = batchEvents()
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("v0"))
      .collect()
      .map { r =>
        val (n, v0) = (r.getLong(1), r.getLong(2))
        val v1 = n - v0
        val chi2 = BigInt(1000000) * BigInt(v0 - v1) * BigInt(v0 - v1) / n
        r.getTimestamp(0).getTime * 1000L ->
          (n, v0, v1, chi2.toLong, chi2 > 3841459L)
      }.toMap
    assert(got.nonEmpty && got == expected)
    // every event is in exactly one window
    assert(got.values.map(_._1).sum == batchEvents().count())
  }

  test("transformWithState running totals match the batch aggregation") {
    val stream = EventStreams.readEvents(spark, streamDir)
    runToMemory(EventStreams.runningTotals(spark, stream), "tws_totals", mode = "update")
    // single micro-batch → one emission per user with final totals
    val got = spark.sql(
      "select user_id, n_events, sum_value from tws_totals")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = batchEvents().groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("streaming rate spikes equal the batch q106 rows they flush") {
    val stream = EventStreams.readEvents(spark, streamDir)
    runToMemory(EventStreams.rateSpikes(spark, stream), "spikes")
    def key(t: String, h: Long) = (t, h)
    val got = spark.sql(
      "select event_type, unix_micros(hour) as h, n_events, trailing_events, spike_permille from spikes")
      .collect()
      .map(r => key(r.getString(0), r.getLong(1)) ->
        (r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    val batch = graft.queries.EventsOps.defs.find(_.name == "q106_rate_spikes").get
      .fn(spark, dir)
      .select(col("event_type"), unix_micros(col("hour")).as("h"),
        col("n_events"), col("trailing_events"), col("spike_permille"))
      .collect()
      .map(r => key(r.getString(0), r.getLong(1)) ->
        (r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(got.nonEmpty)
    // every flushed streaming hour must match its batch row bit-for-bit
    val bad = got.filter { case (k, v) => batch.get(k) != Some(v) }
    assert(bad.isEmpty, s"mismatched hours: ${bad.take(3)}")
    // coverage: the watermark leaves at most the tail hours unflushed
    val perType = batch.keySet.groupBy(_._1).view.mapValues(_.size)
    got.keySet.groupBy(_._1).foreach { case (t, hrs) =>
      assert(hrs.size >= perType(t) - 2, s"type $t flushed only ${hrs.size}")
    }
  }

  test("flatMapGroupsWithState sessionizer agrees with the batch q11 sessions") {
    val stream = EventStreams.readEvents(spark, streamDir)
    runToMemory(EventStreams.sessionize(spark, stream), "fmgs_sessions")
    // The stream ends without advancing the watermark past the last
    // session, so open sessions stay in state; compare closed sessions
    // against the batch sessionization (q11) restricted to sessions that
    // end before the final watermark could close them.
    val streamed = spark.sql(
      "select user_id, session_start_us, n_events from fmgs_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.queries.EventsOps.defs.find(_.name == "q11_sessionize").get
      .fn(spark, dir)
      .select(col("user_id"), unix_micros(col("session_start")).as("start_us"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    // every closed streaming session must exist identically in batch
    assert(streamed.subsetOf(batch),
      s"streaming sessions not found in batch: ${streamed.diff(batch).take(5)}")
  }
}
