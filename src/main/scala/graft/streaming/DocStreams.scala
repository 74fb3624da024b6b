package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming DOCUMENT ingest — the streaming twin of the batch corpus
  * operators: content-fingerprint dedup at ingest time (q58's
  * fingerprint-first shape as a continuous query). An arriving document
  * is admitted iff its md5 content fingerprint has never been seen;
  * replays and re-crawls of identical content are dropped at the door
  * instead of accumulating for the next batch dedup pass.
  *
  * Semantics vs the batch q58: batch canonicalizes to min doc_id per
  * fingerprint; a stream admits the FIRST ARRIVAL (within a single
  * micro-batch, the min doc_id of the batch's claimants — deterministic
  * under replay). The kept fingerprint SET is identical either way;
  * which id represents it can differ — that is the inherent
  * streaming/batch delta, and the parity spec pins exactly the part
  * that must agree.
  *
  * State design at 100 TB: fingerprint state can NEVER be
  * watermark-evicted without silently reopening the dedup window — so
  * it is keyed ValueState on the RocksDB provider (native memory +
  * changelog checkpoints, not executor heap), sized ~40 B/distinct doc.
  * Operationally you bound it with a TTL equal to your re-dedup
  * horizon and let the periodic batch pass (incremental q86: delta
  * fingerprints anti-joined against the corpus index) reconcile
  * anything past the horizon. TTLConfig.NONE here = infinite horizon.
  */
object DocStreams {

  final case class FpDoc(fingerprint: String, doc_id: Long)
  final case class KeptDoc(doc_id: Long, fingerprint: String)

  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(graft.schema.Schemas.documents)
      .parquet(dir)

  /** Admit only never-seen-before content fingerprints. */
  def dedupByFingerprint(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    EventStreams.withRocksDBStateStore(spark)
    docs
      .select(md5(col("text")).as("fingerprint"), col("doc_id"))
      .as[FpDoc]
      .groupByKey(_.fingerprint)
      .transformWithState(
        new FingerprintDedupProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append)
      .toDF()
  }

  /** Keyed by fingerprint; one boolean of state per distinct content. */
  class FingerprintDedupProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, FpDoc, KeptDoc] {
    import org.apache.spark.sql.{Encoders => E}
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      seen = getHandle.getValueState(
        "seen", E.scalaBoolean, org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        inputRows: Iterator[FpDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[KeptDoc] = {
      if (seen.exists()) { inputRows.foreach(_ => ()); Iterator.empty }
      else {
        // several claimants of the same new fingerprint can share a
        // micro-batch: admit the min doc_id for replay determinism
        var minId = Long.MaxValue
        inputRows.foreach(r => if (r.doc_id < minId) minId = r.doc_id)
        seen.update(true)
        Iterator(KeptDoc(minId, key))
      }
    }
  }
}
