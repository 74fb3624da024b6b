package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming SINKS — the write half of the streaming story
  * ([[EventStreams]] is the transform half). Two exactly-once recipes:
  *
  *  1. The built-in FILE sink: Spark's checkpoint WAL plus the sink's
  *     `_spark_metadata` commit log make file output exactly-once —
  *     a restarted query re-runs an uncommitted batch but commits its
  *     files once; readers only see committed files.
  *  2. `foreachBatch` + idempotent write: for sinks WITHOUT a commit
  *     log (JDBC, key-value stores, plain directories), exactly-once
  *     degrades to at-least-once-with-idempotence: every write is keyed
  *     by `batch_id` and re-writing a replayed batch overwrites its own
  *     partition (dynamic partition overwrite), so retries converge to
  *     the same state.
  *
  * Both use `Trigger.AvailableNow`: drain everything available, then
  * stop — the batch-friendly way to run a streaming pipeline to
  * completion (backfills, tests, cron-style incremental jobs), while
  * keeping the same code deployable with a continuous trigger.
  *
  * At scale the file sink's metadata log grows with files-per-batch —
  * size batches (maxFilesPerTrigger / maxOffsetsPerTrigger) so each
  * commit stays small, and compact with the log's built-in compaction
  * interval.
  */
object EventSinks {

  /** Exactly-once parquet file sink (commit-log based). */
  def startParquetFileSink(
      df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Idempotent-by-batch sink for targets without a commit log. The
    * batch write overwrites ONLY its own `batch_id=<id>` partition
    * (dynamic overwrite), so a replayed batch converges instead of
    * duplicating.
    */
  def startIdempotentBatchSink(
      df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.withColumn("batch_id", lit(id))
          .write.mode("overwrite")
          .partitionBy("batch_id")
          .parquet(path)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
