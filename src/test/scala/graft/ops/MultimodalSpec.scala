package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mediaDf() = {
    val rows = Seq(
      Row(1L, "image", "image/png", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8),
        Row(2, 2, null)),
      Row(2L, "audio", "audio/wav", Array[Byte](9, 8, 7, 6), Row(null, null, 1000L)),
      Row(3L, "video", "video/mp4", (1 to 64).map(_.toByte).toArray,
        Row(4, 4, 2000L)),
      Row(4L, "image", "image/png", null, Row(null, null, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("featurize is deterministic, total, and fixed-width") {
    val out = Multimodal.featurize(spark, mediaDf()).collect()
    assert(out.length == 4)
    assert(out.forall(_.feature.length == Multimodal.StubCodec.FeatureDim))
    val again = Multimodal.featurize(spark, mediaDf()).collect()
    assert(out.sortBy(_.media_id).zip(again.sortBy(_.media_id)).forall {
      case (a, b) => a.checksum == b.checksum && a.feature.sameElements(b.feature)
    })
    // null payload degrades to zeros, never throws
    val nullRow = out.find(_.media_id == 4L).get
    assert(nullRow.n_bytes == 0L && nullRow.feature.forall(_ == 0.0f))
  }

  test("frame sampling emits bounded per-video fan-out") {
    val frames = Multimodal.sampleFrames(spark, mediaDf(), stride = 4).collect()
    // one video row, 64 bytes → 16 frames, stride 4 → 4 sampled
    assert(frames.length == 4)
    assert(frames.forall(_.getAs[Long]("media_id") == 3L))
    assert(frames.map(_.getAs[Int]("frame_no")).sorted.toSeq == Seq(0, 4, 8, 12))
  }

  test("resize downsamples payload and keeps metadata consistent") {
    val out = Multimodal.resize(spark, mediaDf(), factor = 2).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Array[Byte]]("payload"),
        r.getAs[Int]("width"))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 4L)) // image rows only
    assert(out.head._2.toSeq == Seq[Byte](1, 3, 5, 7)) // every 2nd byte
    assert(out.head._3 == 1) // width 2 → 1
    assert(out(1)._2.isEmpty) // null payload degrades to empty
  }

  test("feature schema carries no binary column downstream") {
    val df = Multimodal.featurize(spark, mediaDf()).toDF()
    assert(!df.schema.fields.exists(_.dataType.typeName == "binary"))
  }
}
