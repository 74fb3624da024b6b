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

  test("q97 plans hash aggregates only — the multi-distinct Expand/sort trap stays out") {
    val df = graft.SparkEntry.queries("q97_column_profile")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // Spark's multi-distinct rewrite would Expand rows ×(C+1) and sort on
    // a C-column mixed-type key (measured 10× slower); the profiler must
    // keep distincts as separate hash aggregations. A grouping-key-less
    // SortAggregate (min/max over a string buffer) is fine — with no key
    // there is nothing to sort — so pin the absence of Sort NODES.
    assert(!plan.contains("Expand"),
      s"multi-distinct Expand leaked back in:\n$plan")
    assert(!plan.contains("+- Sort "),
      s"a real sort appeared in the profile plan:\n$plan")
    assert(plan.contains("HashAggregate(keys=[l_orderkey"),
      s"distincts must be two-phase hash aggregations:\n$plan")
    // shared stats pass + one pruned scan per exact distinct
    val nScans = "Scan parquet".r.findAllIn(plan).length
    assert(nScans == 6, s"expected 1 stats + 5 distinct scans, got $nScans:\n$plan")
  }
}
