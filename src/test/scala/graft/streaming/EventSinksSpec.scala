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

  test("snapshot upsert sink: versioned merge across incremental batches") {
    import spark.implicits._
    val changeDir = java.nio.file.Files.createTempDirectory("cdc_stream").toString
    val (out, ckpt) = (
      java.nio.file.Files.createTempDirectory("cdc_snap").toString,
      java.nio.file.Files.createTempDirectory("cdc_ckpt").toString)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING, op STRING")
    def run(): Unit = EventSinks.startSnapshotUpsertSink(
      spark.readStream.schema(schema).parquet(changeDir),
      Seq("id"), out, ckpt).awaitTermination()
    // the file source only lists top-level files: write each change set
    // to a scratch dir, then move its part file into the stream dir
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("cdc_chg").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(changeDir, s"$name.parquet"))
    }

    // batch 0: ten upserts → v=0 snapshot has ids 1..10
    addFile((1L to 10L).map(i => (i, s"a$i", "upsert")).toDF("id", "v", "op"), "b0")
    run()
    val v0 = spark.read.parquet(s"$out/v=0")
    assert(v0.count() == 10 && v0.columns.sorted.sameElements(Array("id", "v")))

    // batch 1: delete 1..5, update 6, insert 11 → cumulative snapshot
    addFile(((1L to 5L).map(i => (i, null.asInstanceOf[String], "delete"))
      :+ (6L, "B6", "upsert") :+ (11L, "a11", "upsert"))
      .toDF("id", "v", "op"), "b1")
    run()
    val v1 = spark.read.parquet(s"$out/v=1")
      .as[(Long, String)].collect().toMap
    assert(v1.keySet == (6L to 11L).toSet)
    assert(v1(6L) == "B6" && v1(7L) == "a7" && v1(11L) == "a11")
    // earlier versions remain immutable (time travel)
    assert(spark.read.parquet(s"$out/v=0").count() == 10)
  }

  test("snapshot upsert sink refuses a fresh checkpoint against an existing series") {
    import spark.implicits._
    val changeDir = java.nio.file.Files.createTempDirectory("cdc_stream2").toString
    val out = java.nio.file.Files.createTempDirectory("cdc_snap2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ckpt2").toString
    // an existing series written by a previous incarnation of the stream
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out, "v=7"))
    val tmp = java.nio.file.Files.createTempDirectory("cdc_chg2").toString
    Seq((1L, "a1", "upsert")).toDF("id", "v", "op")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    java.nio.file.Files.move(part,
      java.nio.file.Paths.get(changeDir, "b0.parquet"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING, op STRING")
    // the FRESH checkpoint restarts batch ids at 0 < 7: rebasing v=0 on
    // an empty snapshot while v=7 lingers would corrupt the series
    val e = intercept[Throwable] {
      EventSinks.startSnapshotUpsertSink(
        spark.readStream.schema(schema).parquet(changeDir),
        Seq("id"), out, ckpt).awaitTermination()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(e).contains("exceed current batch id"),
      s"expected the stale-series guard, got: ${messages(e).take(500)}")
    // and nothing was written for batch 0
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "v=0")))
  }

  test("snapshot upsert sink refuses a reset checkpoint even when batch ids overlap the series") {
    import spark.implicits._
    // the version-number guard can't see this case: series head is v=0 and
    // a fresh checkpoint also restarts at batch 0 — indistinguishable from
    // a legitimate replay by ids alone. The _stream_id marker must catch it.
    val changeDir = java.nio.file.Files.createTempDirectory("cdc_stream3").toString
    val out = java.nio.file.Files.createTempDirectory("cdc_snap3").toString
    val ckpt1 = java.nio.file.Files.createTempDirectory("cdc_ckpt3a").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING, op STRING")
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("cdc_chg3").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(changeDir, s"$name.parquet"))
    }
    addFile(Seq((1L, "a1", "upsert"), (2L, "a2", "upsert")).toDF("id", "v", "op"), "b0")
    EventSinks.startSnapshotUpsertSink(
      spark.readStream.schema(schema).parquet(changeDir),
      Seq("id"), out, ckpt1).awaitTermination()
    assert(spark.read.parquet(s"$out/v=0").count() == 2)

    // same series, FRESH checkpoint: its batch 0 would rebase v=0 on an
    // empty snapshot and silently lose the series head without the marker
    val ckpt2 = java.nio.file.Files.createTempDirectory("cdc_ckpt3b").toString
    val e = intercept[Throwable] {
      EventSinks.startSnapshotUpsertSink(
        spark.readStream.schema(schema).parquet(changeDir),
        Seq("id"), out, ckpt2).awaitTermination()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(e).contains("checkpoint was reset"),
      s"expected the stream-id guard, got: ${messages(e).take(500)}")
    // the original v=0 snapshot survives untouched
    assert(spark.read.parquet(s"$out/v=0").count() == 2)

    // and the ORIGINAL checkpoint still replays/extends the series fine
    addFile(Seq((3L, "a3", "upsert")).toDF("id", "v", "op"), "b1")
    EventSinks.startSnapshotUpsertSink(
      spark.readStream.schema(schema).parquet(changeDir),
      Seq("id"), out, ckpt1).awaitTermination()
    assert(spark.read.parquet(s"$out/v=1").count() == 3)
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
    // a TRUE replay re-runs an uncommitted batch under the SAME
    // checkpoint: same query id, same batch id — the write must
    // converge to the same rows, not append duplicates. Simulated at
    // the helper level (the sink's per-batch body), replaying batch 0
    // against the same output with the original checkpoint.
    val batch0 = spark.read.parquet(out).drop("batch_id")
    EventSinks.writeIdempotentPartition(batch0, 0L, out, ckpt)
    assert(spark.read.parquet(out).count() == n)
  }

  test("idempotent sink refuses a RESET checkpoint against an existing output") {
    val (out, ckpt) = freshDirs()
    val events = EventStreams.readEvents(spark, streamDir)
      .select(col("event_id"), col("event_type"))
    EventSinks.startIdempotentBatchSink(events, out, ckpt).awaitTermination()
    // a FRESH checkpoint restarts batch ids at 0; against an existing
    // multi-batch output that silently duplicates — the _stream_id
    // marker must fail loudly instead (r07 review finding)
    val ckpt2 = java.nio.file.Files.createTempDirectory("sink_ckpt2").toString
    val q = EventSinks.startIdempotentBatchSink(events, out, ckpt2)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("checkpoint was reset")))
  }
}
