package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms.
  *
  * The Spark-side plumbing — explicit schema, partition-sized batching,
  * typed output contract — is real and tested; the codec itself is a
  * deterministic stand-in (this container ships no image/audio libs; see
  * [[StubCodec]]). Swapping in a real decoder changes ONE function, not
  * the pipeline shape.
  *
  * Scale design (100 TB of media): binaries stay opaque through the scan
  * (no row-group decode amplification); per-partition processing
  * amortizes codec init (a model/codec handle per task, never per row);
  * `spark.sql.files.maxPartitionBytes` bounds task memory because each
  * partition holds its batch of blobs once; derived features are small
  * fixed-width arrays so downstream shuffles never move the blobs —
  * project the binary away before any wide stage.
  */
object Multimodal {

  /** Media row: opaque payload + the metadata a catalog would carry. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),      // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  final case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  /** Deterministic stand-in codec. A real deployment replaces `decode`
    * with an actual image/audio decoder; everything else is unchanged.
    */
  object StubCodec {
    val FeatureDim = 16

    /** Pretend-decode: derives a stable FeatureDim-float signature from
      * payload bytes (rolling 64-bit hash per stripe). Deterministic,
      * total, allocation-light — shaped like an embedding model output.
      */
    def decode(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      if (payload == null || payload.isEmpty) return out
      var i = 0
      while (i < payload.length) {
        val lane = i % FeatureDim
        out(lane) = out(lane) * 31.0f + (payload(i) & 0xFF)
        i += 1
      }
      var l = 0
      while (l < FeatureDim) { out(l) = out(l) % 997.0f; l += 1 }
      out
    }

    def checksum(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      if (payload == null) return 0L
      var i = 0
      while (i < payload.length) { h = 31 * h + (payload(i) & 0xFF); i += 1 }
      h
    }
  }

  /** decode + featurize each partition's blobs: one codec "handle" per
    * partition (the real-decoder init seam), rows processed in partition
    * order, binary never re-emitted.
    */
  def featurize(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here (model load, JNI handle)
        rows.map { case (id, kind, payload) =>
          MediaFeature(
            id, kind,
            if (payload == null) 0L else payload.length.toLong,
            StubCodec.checksum(payload),
            StubCodec.decode(payload))
        }
      }
  }

  /** "Resize" for image-kind rows: deterministic byte-domain downsample
    * standing in for a pixel resize — keeps every `factor`-th byte of the
    * payload and rewrites the metadata dims accordingly. Shape contract
    * of a real resize: binary in → smaller binary out, metadata kept
    * consistent, per-partition batch processing.
    */
  def resize(spark: SparkSession, media: DataFrame, factor: Int): DataFrame = {
    import spark.implicits._
    require(factor > 0, "resize factor must be positive")
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[(Long, Array[Byte], Option[Int], Option[Int])]
      .mapPartitions { rows =>
        rows.map { case (id, payload, w, h) =>
          val out =
            if (payload == null) Array.emptyByteArray
            else payload.grouped(factor).map(_.head).toArray
          (id, out, w.map(x => math.max(1, x / factor)),
            h.map(x => math.max(1, x / factor)))
        }
      }
      .toDF("media_id", "payload", "width", "height")
  }

  /** Frame sampling for video-kind rows: emit every `stride`-th 4-byte
    * stripe as a "frame" reference — the shape (one row per sampled
    * frame, bounded fan-out) of real frame extraction.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val nFrames = if (payload == null) 0 else payload.length / 4
        (0 until nFrames by stride).map { f =>
          (id, f, StubCodec.checksum(payload.slice(f * 4, f * 4 + 4)))
        }
      }
      .toDF("media_id", "frame_no", "frame_checksum")
  }
}
