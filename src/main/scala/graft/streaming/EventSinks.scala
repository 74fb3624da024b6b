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

  /** The streaming query id recorded in `checkpoint/metadata` — stable
    * across restarts of the SAME checkpoint, fresh for a new one.
    */
  private[graft] def streamQueryId(
      fs: org.apache.hadoop.fs.FileSystem, checkpoint: String): Option[String] = {
    val meta = new org.apache.hadoop.fs.Path(checkpoint, "metadata")
    if (!fs.exists(meta)) None
    else {
      val in = fs.open(meta)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1))
    }
  }

  /** Pin an output directory to ONE streaming query via a `_stream_id`
    * marker: a FRESH checkpoint against an existing output restarts
    * batch ids at 0, and idempotent-by-batch writes would then rewrite
    * low-numbered partitions while stale high-numbered ones survive —
    * silent duplication. Mismatch fails loudly before any write.
    */
  private[graft] def assertStreamIdentity(
      fs: org.apache.hadoop.fs.FileSystem, outPath: org.apache.hadoop.fs.Path,
      queryId: Option[String], what: String): Unit = queryId.foreach { qid =>
    val marker = new org.apache.hadoop.fs.Path(outPath, "_stream_id")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val existing = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      if (existing != qid) throw new IllegalStateException(
        s"$what at $outPath: output belongs to streaming query $existing " +
          s"but this run's checkpoint has query id $qid — the checkpoint " +
          "was reset against an existing output. Use a fresh output path " +
          "or restore the original checkpoint.")
    } else {
      fs.mkdirs(outPath)
      val out = fs.create(marker, true)
      try out.write(qid.getBytes("UTF-8")) finally out.close()
    }
  }

  /** One idempotent-by-batch partition write, guarded: verify the
    * `_stream_id` marker, then overwrite ONLY this batch's
    * `batch_id=<id>` partition (dynamic overwrite) so a replayed batch
    * converges instead of duplicating. Shared by
    * [[startIdempotentBatchSink]] and
    * `graft.etl.Clean.runStreamWithQuarantine`.
    */
  private[graft] def writeIdempotentPartition(
      batch: DataFrame, id: Long, path: String, checkpoint: String): Unit = {
    val s = batch.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    assertStreamIdentity(fs, hPath, streamQueryId(fs, checkpoint),
      "idempotent-batch sink")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    batch.withColumn("batch_id", lit(id))
      .write.mode("overwrite")
      .partitionBy("batch_id")
      .parquet(path)
  }

  /** Exactly-once parquet file sink (commit-log based). */
  def startParquetFileSink(
      df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming CDC upsert: maintain a keyed snapshot as a versioned
    * parquet series. Each micro-batch is a change set (rows tagged
    * `opCol` ∈ upsert|delete, at most one row per key — dedup upstream,
    * e.g. latest-by-timestamp); version `v=<batchId>` is
    * `SnapshotDiff.merge(latest version < batchId, batch)`. A replayed
    * batch rewrites the SAME version dir, so retries converge
    * (exactly-once by idempotence), and every committed version is an
    * immutable, time-travelable snapshot.
    *
    * At 100 TB the per-batch cost is the merge's: the snapshot side
    * only anti-joins the broadcast change keys (it never shuffles),
    * and old-version retention is a compaction/GC policy
    * ([[graft.ops.Compaction]] territory) — the same ledger design
    * table formats (Delta/Iceberg) implement with manifest files.
    */
  def startSnapshotUpsertSink(
      changes: DataFrame, keys: Seq[String], path: String,
      checkpoint: String, opCol: String = "op"): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val hPath = new org.apache.hadoop.fs.Path(path)
        val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        val versions =
          if (!fs.exists(hPath)) Seq.empty[Long]
          else fs.listStatus(hPath).toSeq.map(_.getPath.getName)
            .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong)
        // A restart with a FRESH checkpoint restarts batch ids at 0;
        // versions above the current id would then be silently ignored
        // as bases now and wrongly used as bases once ids catch up —
        // fail loudly instead of corrupting the series. (v == id is the
        // legitimate replay-of-an-uncommitted-batch case and rewrites
        // its own dir idempotently.)
        val ahead = versions.filter(_ > id)
        if (ahead.nonEmpty) throw new IllegalStateException(
          s"snapshot-upsert sink at $path: existing version dirs " +
            ahead.sorted.map("v=" + _).mkString(", ") +
            s" exceed current batch id $id — the checkpoint was reset " +
            "against an existing snapshot series. Use a fresh output " +
            "path or restore the original checkpoint.")
        // The version check alone can't see a reset checkpoint whose new
        // batch ids already cover the existing series (e.g. series head
        // v=0, fresh checkpoint restarts at id 0 — indistinguishable from
        // a legitimate replay). So the series also carries the streaming
        // query id (stable across restarts of the SAME checkpoint, fresh
        // for a new one) in a _stream_id marker: mismatch = reset
        // checkpoint → fail before overwriting anything.
        val queryId = streamQueryId(fs, checkpoint)
        assertStreamIdentity(fs, hPath, queryId, "snapshot-upsert sink")
        val current = versions.filter(_ < id).sorted.lastOption match {
          case Some(v) => s.read.parquet(s"$path/v=$v")
          case None => s.createDataFrame(
            s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(
              batch.schema.filterNot(_.name == opCol)))
        }
        graft.ops.SnapshotDiff.merge(current, batch, keys, opCol)
          .write.mode("overwrite").parquet(s"$path/v=$id")
        ()
      }
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
        writeIdempotentPartition(batch, id, path, checkpoint)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
