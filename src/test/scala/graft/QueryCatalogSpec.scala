package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape checks for every catalog query at sf0.001. The real
  * correctness gate is the driver's DuckDB hash-compare (replayed locally
  * by tools/local_verify.py at sf0.01); these tests catch regressions
  * cheaply inside `sbt test`.
  */
class QueryCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or a documented omission") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  for (q <- QueryDef.all) {
    test(s"${q.name} runs at sf0.001") {
      val df = q.fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("q1 row counts reconcile with the filtered scan") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, dir).collect()
    val expected = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_shipdate") <= org.apache.spark.sql.functions.lit("1998-09-02").cast("timestamp"))
      .count()
    assert(rows.map(_.getAs[Long]("count_order")).sum == expected)
  }

  test("q20 returns exactly 5 neighbors per vector") {
    val rows = SparkEntry.queries("q20_cosine_topk")(spark, dir)
      .groupBy("vec_id").count().collect()
    assert(rows.forall(_.getAs[Long]("count") == 5L))
  }

  test("q13 dedup covers every document") {
    val n = SparkEntry.queries("q13_exact_dedup")(spark, dir).count()
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(n <= total && n > 0)
  }
}
