package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Exactly-once semantics of the two streaming sink recipes: file-sink
  * commit log dedups across restarts; foreachBatch converges because a
  * replayed batch overwrites its own batch_id partition.
  */
class EventSinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshDirs(): (String, String) = (
    java.nio.file.Files.createTempDirectory("sink_out").toString,
    java.nio.file.Files.createTempDirectory("sink_ckpt").toString)

  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_sink_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("part-00000.parquet"))
    d.toString
  }

  private def nEvents: Long = spark.read.parquet(s"$dir/events.parquet").count()

  test("file sink writes every row exactly once, and a restart adds nothing") {
    val (out, ckpt) = freshDirs()
    val q = EventSinks.startParquetFileSink(
      EventStreams.readEvents(spark, streamDir), out, ckpt)
    q.awaitTermination()
    assert(spark.read.parquet(out).count() == nEvents)
    // restart with the same checkpoint and no new data: the commit log
    // must prevent any re-emission
    val q2 = EventSinks.startParquetFileSink(
      EventStreams.readEvents(spark, streamDir), out, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == nEvents)
  }

  test("foreachBatch sink partitions by batch id and replay converges") {
    val (out, ckpt) = freshDirs()
    val events = EventStreams.readEvents(spark, streamDir)
      .select(col("event_id"), col("event_type"))
    EventSinks.startIdempotentBatchSink(events, out, ckpt).awaitTermination()
    val first = spark.read.parquet(out)
    val n = first.count()
    assert(n == nEvents)
    assert(first.columns.contains("batch_id"))
    // simulate a replay of the same epoch: a FRESH checkpoint re-runs
    // batch 0 against the same output — dynamic partition overwrite must
    // converge to the same rows, not append duplicates
    val ckpt2 = java.nio.file.Files.createTempDirectory("sink_ckpt2").toString
    EventSinks.startIdempotentBatchSink(events, out, ckpt2).awaitTermination()
    assert(spark.read.parquet(out).count() == n)
  }
}
