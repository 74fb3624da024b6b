package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The custom top-k-per-group physical operator: row-identical to the
  * window + filter form, actually planned through `TopKPerGroupExec`,
  * correct on ties, short groups, and the global (no-group) case.
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q4 via the native operator is row-identical to the window form") {
    def rows(native: Boolean) = {
      if (native) spark.conf.set("spark.graft.topk.native", "true")
      else spark.conf.unset("spark.graft.topk.native")
      try graft.SparkEntry.queries("q4_order_rank_per_customer")(spark, dir)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      finally spark.conf.unset("spark.graft.topk.native")
    }
    val window = rows(native = false)
    val native = rows(native = true)
    assert(native.nonEmpty && native == window)
  }

  test("the plan actually contains TopKPerGroupExec under the flag") {
    spark.conf.set("spark.graft.topk.native", "true")
    try {
      val df = graft.SparkEntry.queries("q4_order_rank_per_customer")(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerGroup"), s"custom operator not planned:\n$p")
      assert(!p.contains("Window"), s"window survived alongside the operator:\n$p")
    } finally spark.conf.unset("spark.graft.topk.native")
  }

  test("ties, short groups, and rank values") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 9.0), ("a", 4L, 8.0),
      ("b", 5L, 1.0), // group smaller than k
      ("c", 6L, 5.0), ("c", 7L, 7.0))
      .toDF("g", "id", "v")
    val out = graft.ops.TopK.perGroup(df, Seq("g"),
      Seq(col("v").desc, col("id").asc), 2, "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted
    assert(out.toSeq == Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), // tie broken by id
      ("b", 5L, 1L),
      ("c", 6L, 2L), ("c", 7L, 1L)))
  }

  test("empty group list = global top-k with ranks") {
    import spark.implicits._
    val df = (1L to 100L).toDF("id").repartition(4)
    val out = graft.ops.TopK.perGroup(df, Seq(), Seq(col("id").desc), 3, "r")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq == Seq((98L, 3L), (99L, 2L), (100L, 1L)))
  }
}
