package graft.etl

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.schema.Schemas

/** Source/sink round-trips beyond parquet: the clean table written and
  * recovered losslessly through CSV and JSONL with explicit schemas (no
  * inference on the read path — SURVEY.md §1 rule).
  */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cleanDf() = {
    import spark.implicits._
    Seq(
      (1L, "Markets rally", "Stocks, up; \"sharply\"", "http://a/1",
        Timestamp.valueOf("2022-01-01 00:00:00"), "BUSINESS"),
      (2L, "Tech layoffs", "Cuts\ndeepen", "http://a/2",
        Timestamp.valueOf("2022-01-02 12:34:56"), "TECH"),
      (3L, "", "empty title survives", "http://a/3",
        Timestamp.valueOf("2022-01-03 23:59:59"), "MONEY"))
      .toDF("id_news", "title", "content", "link", "publish_date", "category")
  }

  private def roundTripEquals(read: => org.apache.spark.sql.DataFrame): Unit = {
    val got = read.collect().map(_.toSeq).toSet
    val want = cleanDf().collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("CSV sink/scan round-trips the clean table (quotes, newlines)") {
    val dir = Files.createTempDirectory("csv_rt").toString + "/out"
    // explicit null sentinel so empty string and NULL stay distinct
    // through the round-trip (CSV's classic ambiguity)
    cleanDf().write.option("header", "true").option("quoteAll", "true")
      .option("nullValue", "\\N").csv(dir)
    roundTripEquals(
      spark.read.schema(Schemas.clean).option("header", "true")
        .option("multiLine", "true").option("nullValue", "\\N")
        .option("emptyValue", "").csv(dir))
  }

  test("JSONL sink/scan round-trips the clean table") {
    val dir = Files.createTempDirectory("json_rt").toString + "/out"
    cleanDf().write.json(dir)
    roundTripEquals(spark.read.schema(Schemas.clean).json(dir))
  }
}
