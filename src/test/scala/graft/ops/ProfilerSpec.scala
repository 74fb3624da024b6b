package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("profile counts rows, nulls, distincts and renders min/max") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some("b")),
      (Some(1L), None),
      (None, Some("a")),
      (Some(3L), Some("a"))).toDF("k", "s")
    val rows = Profiler.profile(df, Seq("k", "s"))
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(rows.keySet == Set("k", "s"))
    val k = rows("k")
    assert(k.getAs[Long]("n_rows") == 4 && k.getAs[Long]("n_nulls") == 1)
    assert(k.getAs[Long]("n_distinct") == 2)
    assert(k.getAs[String]("min_repr") == "1" && k.getAs[String]("max_repr") == "3")
    val s = rows("s")
    assert(s.getAs[Long]("n_nulls") == 1 && s.getAs[Long]("n_distinct") == 2)
    assert(s.getAs[String]("min_repr") == "a" && s.getAs[String]("max_repr") == "b")
  }

  test("repr canonicalizer applies before min/max") {
    import spark.implicits._
    val df = Seq(2.5, 1.25, 10.0).toDF("x")
    val row = Profiler.profile(df, Seq("x"),
      Map("x" -> (c => graft.Tables.dec(c)))).collect().head
    assert(row.getAs[String]("min_repr") == "1.250000")
    assert(row.getAs[String]("max_repr") == "10.000000")
  }

  test("q97 profiles five columns in a single scan of lineitem") {
    val df = graft.SparkEntry.queries("q97_column_profile")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val nScans = "Scan parquet".r.findAllIn(plan).length
    assert(nScans == 1, s"expected one lineitem scan, got $nScans:\n$plan")
  }
}
