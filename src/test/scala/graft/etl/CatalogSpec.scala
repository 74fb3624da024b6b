package graft.etl

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Stage-3 semantics: SQL view surface (S6) and MSCK partition repair
  * (S5) against a real partitioned external table — the reference's
  * Athena submit-and-poll loop reduced to synchronous Spark commands.
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def enrichedDf() = {
    import spark.implicits._
    Seq(
      (1L, "T1", "C1", "l1", Timestamp.valueOf("2021-06-01 00:00:00"), "TECH"),
      (2L, "T2", "C2", "l2", Timestamp.valueOf("2022-06-01 00:00:00"), "MONEY"),
      (3L, "T3", "C3", "l3", Timestamp.valueOf("2022-07-01 00:00:00"), "TECH"))
      .toDF("id_news", "title", "content", "link", "publish_date", "category")
  }

  test("registered view serves ad-hoc SQL (the Athena replacement)") {
    Catalog.registerView(enrichedDf(), "enriched_news_test")
    val n = spark.sql(
      "SELECT COUNT(*) FROM enriched_news_test WHERE category = 'TECH'")
      .head().getLong(0)
    assert(n == 2L)
  }

  test("partitioned write + MSCK REPAIR discovers partitions") {
    val dir = Files.createTempDirectory("catalog_part").toString
    Catalog.writePartitioned(enrichedDf(), dir)
    spark.sql("DROP TABLE IF EXISTS news_part_test")
    spark.sql(
      s"""CREATE TABLE news_part_test (id_news BIGINT, title STRING,
         |content STRING, link STRING, publish_date TIMESTAMP,
         |category STRING) USING PARQUET
         |PARTITIONED BY (publish_year INT)
         |LOCATION '$dir'""".stripMargin)
    // before repair the catalog knows no partitions
    assert(spark.sql("SELECT * FROM news_part_test").count() == 0L)
    Catalog.repairTable(spark, "news_part_test")
    assert(spark.sql("SELECT * FROM news_part_test").count() == 3L)
    val years = spark.sql("SHOW PARTITIONS news_part_test").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(years == Seq("publish_year=2021", "publish_year=2022"))
    spark.sql("DROP TABLE news_part_test")
  }
}
