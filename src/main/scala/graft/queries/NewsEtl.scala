package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef

/** Oracle-checked form of the reference's Stage-1 pipeline
  * (`extract_and_clean_to_s3`, `Main.py:130-182`).
  *
  * The driver test data has no news JSONL, so the query first
  * MATERIALIZES one deterministically from the `documents` table —
  * including every edge case the reference handles: null headline/body,
  * off-list categories, unparseable dates, duplicate dates (tie-break) —
  * then runs `graft.etl.Clean` over it. The oracle SQL reads the SAME
  * materialized file (written before the driver replays SQL) and applies
  * the reference semantics in DuckDB: rename → dropna → IN-list →
  * TRY_CAST coerce → drop unparsed → dense ROW_NUMBER ids over
  * (publish_date, link).
  *
  * Both engines read one shared artifact, so the comparison isolates
  * exactly the Clean-stage semantics.
  */
object NewsEtl {

  /** Fixed path because oracleSql is static; Verify rewrites it each run.
    * The CONTENT is scale-factor-independent (generated from a fixed
    * 1..500 range, not from the documents table): every writer — any sf,
    * test or bench or verify — produces identical bytes, so a run can
    * never poison a later oracle replay with another scale's fixture.
    */
  private val FixtureDir = "/tmp/graft_news_fixture_jsonl"

  private def q47(s: SparkSession, dir: String): DataFrame = {
    val cats = Seq("BUSINESS", "TECH", "MONEY", "POLITICS", "WORLD NEWS",
      "SPORTS", "COMEDY") // last two are off-list → filtered
    val catExpr = expr(
      s"element_at(array(${cats.map(c => s"'$c'").mkString(",")}), CAST(doc_id % 7 AS INT) + 1)")
    val raw = s.range(1, 501).select(col("id").as("doc_id")).select(
      col("doc_id"),
      concat(lit("http://doc/"), col("doc_id")).as("link"),
      // every 17th doc: null headline (dropna casualty)
      when(col("doc_id") % 17 === 0, lit(null: String))
        .otherwise(concat(lit("Headline "), col("doc_id"))).as("headline"),
      catExpr.as("category"),
      // every 13th doc: null body; text is a deterministic hash digest —
      // self-contained, no table dependency
      when(col("doc_id") % 13 === 0, lit(null: String))
        .otherwise(concat(lit("body "), md5(concat(lit("doc"), col("doc_id")))))
        .as("short_description"),
      lit("synthetic").as("authors"),
      // every 31st doc: unparseable date (coerce → dropped); duplicates
      // abound (doc_id % 365) → id tie-break exercised
      when(col("doc_id") % 31 === 0, lit("not-a-date"))
        .otherwise(date_format(
          date_add(lit("2023-01-01").cast("date"), (col("doc_id") % 365).cast("int")),
          "yyyy-MM-dd")).as("date"))
    raw.select(to_json(struct(col("link"), col("headline"), col("category"),
        col("short_description"), col("authors"), col("date"))).as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(FixtureDir)
    graft.etl.Clean.run(s, FixtureDir)
  }

  private val q47Sql =
    s"""WITH raw AS (
      |  SELECT * FROM read_json('$FixtureDir/*.txt', format='newline_delimited',
      |    columns={'link':'VARCHAR','headline':'VARCHAR','category':'VARCHAR',
      |             'short_description':'VARCHAR','authors':'VARCHAR','date':'VARCHAR'})),
      |renamed AS (
      |  SELECT link, headline AS title, short_description AS content,
      |    category, TRY_CAST(date AS TIMESTAMP) AS publish_date
      |  FROM raw
      |  WHERE headline IS NOT NULL AND short_description IS NOT NULL
      |    AND category IS NOT NULL
      |    AND category IN ('WORLD NEWS', 'POLITICS', 'BUSINESS', 'TECH', 'MONEY'))
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY publish_date ASC, link ASC) AS BIGINT) AS id_news,
      |  title, content, link, publish_date, category
      |FROM renamed WHERE publish_date IS NOT NULL""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q47_news_clean", q47, Some(q47Sql)),
  )
}
