package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The compile-only real-client path (`Main.py:92-124` parity), driven
  * through fake transports: success, malformed JSON, mid-call exception,
  * init failure. The client must be total (never throw) and default
  * missing fields to "N/A".
  */
class HttpLlmClientSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ok(json: String): () => LlmTransport =
    () => (_: String, _: String, _: Double) => json

  test("success path parses all three fields") {
    val c = new HttpLlmClient(ok(
      """{"sentiment":"Positive","category":"TECH","summary":"Chips up."}"""))
    assert(c.enrich("t", "c") == LlmResult("Positive", "TECH", "Chips up."))
  }

  test("missing keys default to N/A per-field, not per-row") {
    val c = new HttpLlmClient(ok("""{"sentiment":"Neutral"}"""))
    assert(c.enrich("t", "c") == LlmResult("Neutral", "N/A", "N/A"))
  }

  test("malformed JSON and non-object JSON yield the call-error tuple") {
    for (bad <- Seq("not json at all", """["an","array"]""", """"just a string"""")) {
      val c = new HttpLlmClient(ok(bad))
      assert(c.enrich("t", "c") ==
        LlmResult("ERROR_API", "ERROR_API", "Error generating summary."))
    }
  }

  test("a transport that throws mid-call yields the call-error tuple") {
    val c = new HttpLlmClient(() =>
      (_: String, _: String, _: Double) => throw new RuntimeException("boom"))
    assert(c.enrich("t", "c") ==
      LlmResult("ERROR_API", "ERROR_API", "Error generating summary."))
  }

  test("a factory that fails init yields the unavailable tuple, once-per-client lazily") {
    val c = new HttpLlmClient(() => throw new IllegalStateException("no credentials"))
    assert(c.enrich("t", "c") ==
      LlmResult("ERROR_API", "ERROR_API", "LLM client unavailable."))
    // second call must not retry-throw either
    assert(c.enrich("t2", "c2").sentiment == "ERROR_API")
  }

  test("prompt text is verbatim the reference prompt (Main.py:76-83)") {
    val p = LlmClient.promptFor("TITLE_X", "CONTENT_Y")
    assert(p ==
      "Analyze the following article and provide THREE data points in JSON format: " +
      "1. The sentiment, choosing ONLY one of: 'Positive', 'Negative', 'Neutral'. " +
      "2. The CATEGORY, choosing ONLY one from this list: WORLD NEWS, POLITICS, BUSINESS, TECH, MONEY. " +
      "3. A concise summary of a maximum of 2 sentences explaining why this could be affecting the global markets. " +
      "Ensure the JSON keys are 'sentiment', 'category', and 'summary'." +
      "\nTitle: TITLE_X\nContent: CONTENT_Y")
  }

  test("HttpLlmClient drives Enrich.run end-to-end over Spark tasks") {
    import spark.implicits._
    val clean = Seq(
      (1L, "good news", "markets rally", "l1",
        java.sql.Timestamp.valueOf("2022-01-01 00:00:00"), "BUSINESS"),
      (2L, "bad parse", "returns junk", "l2",
        java.sql.Timestamp.valueOf("2022-01-02 00:00:00"), "TECH"))
      .toDF("id_news", "title", "content", "link", "publish_date", "category")
    // transport succeeds for row 1's prompt, returns junk for row 2's
    val client = new HttpLlmClient(() => new LlmTransport {
      def complete(model: String, prompt: String, temperature: Double): String =
        if (prompt.contains("good news"))
          """{"sentiment":"Positive","category":"BUSINESS","summary":"Rally."}"""
        else "garbage"
    })
    val out = Enrich.run(spark, clean, Enrich.Config(client = client))
      .orderBy(col("id_news")).collect()
    assert(out(0).getAs[String]("sentiment_llm") == "Positive")
    assert(out(0).getAs[String]("market_impact_summary") == "Rally.")
    assert(out(1).getAs[String]("sentiment_llm") == "ERROR_API")
    assert(out(1).getAs[String]("market_impact_summary") == "Error generating summary.")
  }
}
