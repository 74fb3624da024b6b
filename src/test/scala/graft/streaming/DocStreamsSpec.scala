package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Streaming/batch parity for document-ingest dedup: the admitted
  * fingerprint set must equal q58's distinct-content set exactly; the
  * representative id may differ (first-arrival vs min-id — the inherent
  * streaming delta, documented on [[DocStreams.dedupByFingerprint]]).
  */
class DocStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      d.resolve("part-00000.parquet"))
    d.toString
  }

  test("streaming fingerprint dedup admits exactly the batch-distinct content set") {
    val stream = DocStreams.readDocs(spark, streamDir)
    val q = DocStreams.dedupByFingerprint(spark, stream)
      .writeStream.format("memory").queryName("kept_docs")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val batch = graft.SparkEntry.queries("q58_dedup_fingerprint")(spark, dir)
      .select("fingerprint").collect().map(_.getString(0)).toSet
    val streamed = spark.sql("select fingerprint, doc_id from kept_docs").collect()
    assert(streamed.map(_.getString(0)).toSet == batch)
    assert(streamed.length == batch.size) // exactly one admit per content
    // single-file single-batch source: every claimant shares the batch,
    // so first-arrival == min doc_id == the batch canonical id too
    val batchIds = graft.SparkEntry.queries("q58_dedup_fingerprint")(spark, dir)
      .select("fingerprint", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    streamed.foreach(r => assert(r.getLong(1) == batchIds(r.getString(0))))
  }

  test("a replayed second file of identical content admits nothing new") {
    val d2 = java.nio.file.Files.createTempDirectory("docs_stream2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      d2.resolve("a.parquet"))
    val stream = DocStreams.readDocs(spark, d2.toString)
    val q = DocStreams.dedupByFingerprint(spark, stream)
      .writeStream.format("memory").queryName("kept_docs_replay")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("docs_ckpt").toString)
      .start()
    q.processAllAvailable()
    // replay: drop the same content in again as a new file
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      d2.resolve("b.parquet"))
    q.processAllAvailable()
    q.stop()
    val total = spark.read.parquet(s"$dir/documents.parquet")
      .select(md5(col("text"))).distinct().count()
    assert(spark.sql("select count(*) from kept_docs_replay").head().getLong(0) == total)
  }

  /** Batch truth for the streaming detector: distinct pairs sharing ≥ 1
    * MinHash band (q17's band-join candidate set, built from the same
    * [[graft.ops.MinHash.withBands]] signatures).
    */
  private def bandJoinTruth: Set[(Long, Long)] = {
    graft.functions.VectorExpressions.register(spark)
    val ex = graft.ops.MinHash.withBands(
        graft.Tables.load(spark, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(array((0 until graft.ops.MinHash.NumBands)
        .map(i => concat_ws(":", lit(i), col(s"band$i"))): _*)).as("bk"))
    ex.as("a").join(ex.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .collect() // collect-scale: test assertion, sf0.001 pair set
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("streaming near-dup candidates equal the batch band-join candidate set") {
    val stream = DocStreams.readDocs(spark, streamDir)
    val q = DocStreams.nearDupCandidates(spark, stream, cap = 100000)
      .writeStream.format("memory").queryName("neardup_cands")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("select doc_a, doc_b from neardup_cands")
      .distinct().collect() // collect-scale: test assertion, sf0.001 pair set
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = bandJoinTruth
    assert(truth.nonEmpty, "fixture must contain at least one banded pair")
    assert(streamed == truth)
    // every emitted pair is ordered and non-reflexive
    assert(streamed.forall { case (a, b) => a < b })
  }

  test("multi-batch arrival still yields the exact batch candidate set (state crosses batches)") {
    // split the corpus into three files and force one micro-batch per
    // file: pairs now form across batches through the band-bucket state,
    // not within one batch's shuffle
    val d3 = java.nio.file.Files.createTempDirectory("neardup_stream3")
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
    (0 until 3).foreach { i =>
      val part = docs.filter(col("doc_id") % 3 === i)
      val tmp = java.nio.file.Files.createTempDirectory(s"neardup_part$i")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator()
      var moved = false
      while (f.hasNext && !moved) {
        val p = f.next()
        if (p.toString.endsWith(".parquet")) {
          java.nio.file.Files.copy(p, d3.resolve(f"chunk$i%02d.parquet"))
          moved = true
        }
      }
      assert(moved, s"no parquet part written for chunk $i")
    }
    val stream = spark.readStream
      .schema(graft.schema.Schemas.documents)
      .option("maxFilesPerTrigger", "1")
      .parquet(d3.toString)
    val q = DocStreams.nearDupCandidates(spark, stream, cap = 100000)
      .writeStream.format("memory").queryName("neardup_multibatch")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("neardup_mb_ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("select doc_a, doc_b from neardup_multibatch")
      .distinct().collect() // collect-scale: test assertion, sf0.001 pair set
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == bandJoinTruth)
  }

  test("replayed near-dup content emits no new candidates; cap bounds state") {
    val d2 = java.nio.file.Files.createTempDirectory("neardup_stream2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      d2.resolve("a.parquet"))
    val stream = DocStreams.readDocs(spark, d2.toString)
    val q = DocStreams.nearDupCandidates(spark, stream, cap = 100000)
      .writeStream.format("memory").queryName("neardup_replay")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("neardup_ckpt").toString)
      .start()
    q.processAllAvailable()
    val first = spark.sql("select count(*) from neardup_replay").head().getLong(0)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      d2.resolve("b.parquet"))
    q.processAllAvailable()
    q.stop()
    // identical doc_ids are already bucket members → dropped at the door
    assert(spark.sql("select count(*) from neardup_replay").head().getLong(0) == first)
  }
}
