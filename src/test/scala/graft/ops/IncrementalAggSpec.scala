package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.TestSpark

class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def state(df: DataFrame): DataFrame =
    df.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 6))).as("s"),
        max(col("o_orderdate")).as("m"))

  private val merges = Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
    "n" -> (sum(_)), "s" -> (sum(_)), "m" -> (max(_)))

  private def canon(df: DataFrame): Set[(Long, Long, BigDecimal, Any)] =
    df.collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue(),
      BigDecimal(r.getDecimal(2)), r.get(3))).toSet

  test("combining split states equals the direct aggregate, any split arity") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val direct = canon(state(orders))
    for (k <- Seq(2, 3, 7)) {
      val states = (0 until k).map(i => state(orders.filter(col("o_orderkey") % k === i)))
      assert(canon(IncrementalAgg.combine(states, Seq("o_custkey"), merges)) == direct,
        s"arity $k diverged")
    }
  }

  test("keys present in only one state survive the merge") {
    import spark.implicits._
    val a = Seq((1L, 2L), (2L, 5L)).toDF("k", "n")
    val b = Seq((3L, 7L)).toDF("k", "n")
    val out = IncrementalAgg.combine(Seq(a, b), Seq("k"),
      Seq("n" -> (sum(_)))).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    assert(out == Map(1L -> 2L, 2L -> 5L, 3L -> 7L))
  }

  test("the merge plans as union + aggregate, never a join") {
    val df = graft.SparkEntry.queries("q98_incremental_agg")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"state merge must not join:\n$plan")
    assert(plan.contains("Union"), s"expected a union of states:\n$plan")
  }
}
