package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import java.nio.file.Files

/** Streaming/batch parity for the clean stage: [[Clean.runStream]] over
  * the reference corpus must keep exactly the rows the gated batch stage
  * keeps (same transform, shared by construction), with the documented
  * identity delta — content fingerprint instead of the batch-only dense
  * id. Multi-file arrival exercises the continuous path for real.
  */
class CleanStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val jsonl = "/root/reference/News_Category_Dataset_v3.json"

  test("streaming clean keeps exactly the batch row set (fingerprint identity)") {
    // split the corpus into two files → two arrivals
    val in = Files.createTempDirectory("clean_stream_in")
    val lines = scala.io.Source.fromFile(jsonl)("UTF-8").getLines().toVector
    val (a, b) = lines.splitAt(lines.length / 2)
    Files.write(in.resolve("drop1.jsonl"), a.mkString("\n").getBytes("UTF-8"))
    Files.write(in.resolve("drop2.jsonl"), b.mkString("\n").getBytes("UTF-8"))
    val out = Files.createTempDirectory("clean_stream_out").toString
    val ckpt = Files.createTempDirectory("clean_stream_ckpt").toString

    val q = Clean.runStream(spark, in.toString, out, ckpt)
    q.processAllAvailable()
    q.stop()

    def keyOf(r: org.apache.spark.sql.Row) = (
      r.getAs[String]("title"), r.getAs[String]("content"),
      r.getAs[String]("link"),
      r.getAs[java.sql.Timestamp]("publish_date").toString,
      r.getAs[String]("category"))
    val streamed = spark.read.parquet(out).collect() // collect-scale: test assertion, 463-row fixture
    val batch = Clean.run(spark, jsonl).collect() // collect-scale: test assertion, 463-row fixture
    assert(streamed.map(keyOf).toSet == batch.map(keyOf).toSet)
    assert(streamed.length == batch.length) // no row lost or duplicated
    // the fingerprint is the md5 of the \u0001-joined identity fields
    streamed.foreach { r =>
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest((r.getAs[String]("title") + "\u0001" +
          r.getAs[String]("content") + "\u0001" +
          // mirror production: link is nullable (na.drop omits it) and
          // the stream coalesces it to "" before the join
          Option(r.getAs[String]("link")).getOrElse(""))
          .getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("fingerprint") == expect)
    }
  }

  test("streaming enrich over streaming clean matches the per-row client exactly") {
    // clean-stream the corpus, then enrich-stream its output with the
    // content-deterministic stub and bounded in-task pipelining — the
    // whole reference pipeline as two chained continuous queries
    val in = Files.createTempDirectory("ce_stream_in")
    Files.copy(java.nio.file.Paths.get(jsonl), in.resolve("all.jsonl"))
    val cleanOut = Files.createTempDirectory("ce_stream_clean").toString
    val q1 = Clean.runStream(spark, in.toString, cleanOut,
      Files.createTempDirectory("ce_ckpt1").toString)
    q1.processAllAvailable(); q1.stop()

    val enrichOut = Files.createTempDirectory("ce_stream_enrich").toString
    val q2 = Enrich.runStream(spark, cleanOut, enrichOut,
      Files.createTempDirectory("ce_ckpt2").toString,
      Enrich.Config(client = HashingStubClient, maxConcurrentPerTask = 3))
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.parquet(enrichOut)
      .collect() // collect-scale: test assertion, 463-row fixture
    assert(rows.length == spark.read.parquet(cleanOut).count())
    rows.foreach { r =>
      val expect = HashingStubClient.enrich(
        r.getAs[String]("title"), r.getAs[String]("content"))
      assert(r.getAs[String]("sentiment_llm") == expect.sentiment)
      assert(r.getAs[String]("category_llm") == expect.category)
      assert(r.getAs[String]("market_impact_summary") == expect.summary)
      assert(r.getAs[java.sql.Timestamp]("etl_processing_time") != null)
    }
  }

  test("streaming enrich: partition budget converges a fully-hung transport to ERROR_API") {
    // VERDICT r12 item 8: runStream reuses `pipelined` with the
    // per-partition cumulative budget — prove the STREAMING verb (not
    // just batch EnrichSpec) degrades a transport that hangs every
    // call to the ERROR_API tuple within budget. 463 rows / conc 2 =
    // ~232 waves; without the budget this microbatch would take
    // 232 × 400 ms ≈ 93 s — with it, ≤ budget + one wave's drain.
    object HangingClient extends LlmClient {
      override def enrich(title: String, content: String): LlmResult = {
        val end = System.nanoTime() + 30L * 1000000000L
        while (System.nanoTime() < end) {
          try Thread.sleep(200) catch { case _: InterruptedException => () }
        }
        LlmResult("NEVER", "NEVER", "NEVER")
      }
    }
    val in = Files.createTempDirectory("budget_stream_in")
    Files.copy(java.nio.file.Paths.get(jsonl), in.resolve("all.jsonl"))
    val cleanOut = Files.createTempDirectory("budget_stream_clean").toString
    val q1 = Clean.runStream(spark, in.toString, cleanOut,
      Files.createTempDirectory("budget_ckpt1").toString)
    q1.processAllAvailable(); q1.stop()

    val enrichOut = Files.createTempDirectory("budget_stream_enrich").toString
    val t0 = System.nanoTime()
    val q2 = Enrich.runStream(spark, cleanOut, enrichOut,
      Files.createTempDirectory("budget_ckpt2").toString,
      Enrich.Config(client = HangingClient, maxConcurrentPerTask = 2,
        waveTimeoutMs = 400L, partitionTimeoutMs = 900L,
        maxPartitions = Some(1)))
    q2.processAllAvailable(); q2.stop()
    val secs = (System.nanoTime() - t0) / 1e9

    val rows = spark.read.parquet(enrichOut)
      .collect() // collect-scale: test assertion, 463-row fixture
    assert(rows.length == spark.read.parquet(cleanOut).count(),
      "budget degradation must not lose rows")
    rows.foreach { r =>
      assert(r.getAs[String]("sentiment_llm") == "ERROR_API" &&
        r.getAs[String]("category_llm") == "ERROR_API" &&
        r.getAs[String]("market_impact_summary") == "ERROR_API",
        s"hung call must degrade to the ERROR_API tuple, got $r")
    }
    assert(secs < 30.0,
      f"stream-side partition budget did not converge the hang: $secs%.1f s")
  }

  test("quarantine stream routes corrupt lines to the side sink, clean rows forward") {
    val in = Files.createTempDirectory("q_stream_in")
    val corrupt = """{"link":"http://a/8","headline":"Broken"""
    val lines = Seq(
      """{"link":"http://a/1","headline":"Markets rally","category":"BUSINESS","short_description":"Stocks up","authors":"A","date":"2022-01-02"}""",
      corrupt,
      """{"link":"http://a/2","headline":"Tech layoffs","category":"TECH","short_description":"Cuts deepen","authors":"B","date":"2022-01-01"}""")
    Files.write(in.resolve("d.jsonl"), lines.mkString("\n").getBytes("UTF-8"))
    val out = Files.createTempDirectory("q_stream_out").toString
    val quar = Files.createTempDirectory("q_stream_quar").toString
    val q = Clean.runStreamWithQuarantine(spark, in.toString, out, quar,
      Files.createTempDirectory("q_stream_ckpt").toString)
    q.awaitTermination() // AvailableNow: terminates when drained
    val kept = spark.read.parquet(out)
      .collect() // collect-scale: test assertion, 2 synthetic rows
    assert(kept.length == 2)
    assert(kept.forall(_.getAs[String]("fingerprint") != null))
    // partition discovery infers batch_id as INT from the directory name
    assert(kept.map(_.getAs[Int]("batch_id")).distinct.length == 1)
    val bad = Clean.readQuarantine(spark, quar)
      .collect() // collect-scale: test assertion, 1 synthetic row
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("raw_line") == corrupt)
    // provenance: the quarantined line traces back to its input file
    assert(bad.head.getAs[String]("source_path").endsWith("d.jsonl"))
    assert(bad.head.getAs[Long]("batch_id") >= 0L)
  }

  test("a zero-corruption quarantine reads as an empty frame, not a schema error") {
    val in = Files.createTempDirectory("q_clean_in")
    Files.write(in.resolve("d.jsonl"),
      """{"link":"http://a/1","headline":"T","category":"TECH","short_description":"C","authors":"A","date":"2022-01-01"}"""
        .getBytes("UTF-8"))
    val out = Files.createTempDirectory("q_clean_out").toString
    val quar = Files.createTempDirectory("q_clean_quar").toString
    val q = Clean.runStreamWithQuarantine(spark, in.toString, out, quar,
      Files.createTempDirectory("q_clean_ckpt").toString)
    q.awaitTermination()
    // empty partitioned writes emit no footers; the schema-stable reader
    // must still produce a typed empty frame (and tolerate a missing dir)
    assert(Clean.readQuarantine(spark, quar).count() == 0L)
    assert(Clean.readQuarantine(spark, quar + "_never_created").count() == 0L)
    assert(spark.read.parquet(out).count() == 1L)
  }

  test("a reset checkpoint against an existing output fails loudly, not silently duplicating") {
    val in = Files.createTempDirectory("q_reset_in")
    Files.write(in.resolve("d.jsonl"),
      """{"link":"http://a/1","headline":"T","category":"TECH","short_description":"C","authors":"A","date":"2022-01-01"}"""
        .getBytes("UTF-8"))
    val out = Files.createTempDirectory("q_reset_out").toString
    val quar = Files.createTempDirectory("q_reset_quar").toString
    val q1 = Clean.runStreamWithQuarantine(spark, in.toString, out, quar,
      Files.createTempDirectory("q_reset_ckpt1").toString)
    q1.awaitTermination()
    // new checkpoint, same outputs: batch ids restart at 0 — the
    // _stream_id marker must refuse before anything is overwritten
    val q2 = Clean.runStreamWithQuarantine(spark, in.toString, out, quar,
      Files.createTempDirectory("q_reset_ckpt2").toString)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("checkpoint was reset")))
  }

  test("null-link docs keep distinct fingerprints (concat_ws skip-bug guard)") {
    // two DISTINCT documents engineered to collide if the null link were
    // silently skipped: {t, c+SEP+x, null} vs {t, c, x}. The JSON escape
    // \u0001 is assembled at runtime — written inline it would be
    // unicode-preprocessed by the Scala LEXER into a raw control char,
    // which is invalid inside a JSON string and turns the whole line
    // into a corrupt record (how this test first failed).
    val esc = "\\" + "u0001"
    val in = Files.createTempDirectory("clean_stream_null_in")
    val lines = Seq(
      s"""{"link":null,"headline":"t","category":"TECH","short_description":"c${esc}x","authors":"A","date":"2022-01-01"}""",
      """{"link":"x","headline":"t","category":"TECH","short_description":"c","authors":"B","date":"2022-01-01"}""")
    Files.write(in.resolve("d.jsonl"), lines.mkString("\n").getBytes("UTF-8"))
    val out = Files.createTempDirectory("clean_stream_null_out").toString
    val ckpt = Files.createTempDirectory("clean_stream_null_ckpt").toString
    val q = Clean.runStream(spark, in.toString, out, ckpt)
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(out)
      .collect() // collect-scale: test assertion, 2 synthetic rows
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("fingerprint")).distinct.length == 2,
      "distinct documents must never share a fingerprint")
  }
}
