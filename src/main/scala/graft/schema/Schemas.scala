package graft.schema

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Explicit schemas for the news ETL pipeline.
  *
  * The reference infers every schema at read time (`pd.read_json`,
  * `Main.py:147`) — a single-process pandas artifact. At 100 TB an
  * inference pass is a second full scan, so all production reads here
  * declare their schema up front; JSONL parsing uses PERMISSIVE mode with
  * a corrupt-record column instead of failing the job on a bad line.
  */
object Schemas {

  /** Raw JSONL input — shape of News_Category_Dataset_v3.json
    * (reference `Main.py:147`; fields verified in SURVEY.md §1.1).
    */
  val raw: StructType = StructType(Seq(
    StructField("link", StringType),
    StructField("headline", StringType),
    StructField("category", StringType),
    StructField("short_description", StringType),
    StructField("authors", StringType),
    StructField("date", StringType),
    StructField("_corrupt_record", StringType)))

  /** Driver testdata `documents` table (TESTDATA.md) — declared for
    * streaming reads (FileStreamSource requires an explicit schema).
    */
  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Stage-1 output (reference `Main.py:169`). */
  val clean: StructType = StructType(Seq(
    StructField("id_news", LongType, nullable = false),
    StructField("title", StringType),
    StructField("content", StringType),
    StructField("link", StringType),
    StructField("publish_date", TimestampType),
    StructField("category", StringType)))

  /** Stage-2 output (reference `Main.py:241-259`; golden parquet schema). */
  val enriched: StructType = StructType(clean.fields.toSeq ++ Seq(
    StructField("sentiment_llm", StringType),
    StructField("category_llm", StringType),
    StructField("market_impact_summary", StringType),
    StructField("etl_processing_time", TimestampType)))

  /** Category IN-list filter constant (reference `Main.py:43`). */
  val categoriesToKeep: Seq[String] =
    Seq("WORLD NEWS", "POLITICS", "BUSINESS", "TECH", "MONEY")
}

/** Typed row of the clean table — the enrichment stage input. */
final case class CleanNews(
    id_news: Long,
    title: String,
    content: String,
    link: String,
    publish_date: Timestamp,
    category: String)

/** Typed row of the STREAMING clean output ([[graft.etl.Clean.runStream]]):
  * content fingerprint instead of the batch-only dense id.
  */
final case class StreamCleanNews(
    fingerprint: String,
    title: String,
    content: String,
    link: String,
    publish_date: Timestamp,
    category: String)

/** [[StreamCleanNews]] plus the three enrichment columns (before the
  * per-micro-batch etl_processing_time is appended).
  */
final case class StreamEnrichedNews(
    fingerprint: String,
    title: String,
    content: String,
    link: String,
    publish_date: Timestamp,
    category: String,
    sentiment_llm: String,
    category_llm: String,
    market_impact_summary: String)

/** Typed row of the enriched table (before the constant
  * etl_processing_time column is appended).
  */
final case class EnrichedNews(
    id_news: Long,
    title: String,
    content: String,
    link: String,
    publish_date: Timestamp,
    category: String,
    sentiment_llm: String,
    category_llm: String,
    market_impact_summary: String)
