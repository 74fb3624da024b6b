package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.TestSpark

class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("salted aggregation equals the direct groupBy (exact types)") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val direct = li
      .groupBy(col("l_returnflag").as("key"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 6))).as("sum_value"),
        count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet

    val salted = Salting.saltedSum(
      li, col("l_returnflag"), col("l_orderkey"),
      col("l_quantity").cast(DecimalType(18, 6)), buckets = 16)
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet

    assert(salted == direct)
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("salted join equals the plain inner join") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    val spread = concat_ws(":", col("l_orderkey"), col("l_linenumber"))
    val plain = li.join(supp, Seq("l_suppkey"))
    val salted = Salting.saltedJoin(li, supp, Seq("l_suppkey"), spread)
    assert(canon(salted) == canon(plain))
  }

  test("salted LEFT join preserves unmatched skewed-side rows exactly once") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    // drop most suppliers so many lineitem rows go unmatched
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
      .filter(col("s_nationkey") < 5)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    val spread = concat_ws(":", col("l_orderkey"), col("l_linenumber"))
    val plain = li.join(supp, Seq("l_suppkey"), "left")
    val salted = Salting.saltedJoin(li, supp, Seq("l_suppkey"), spread,
      joinType = "left")
    assert(canon(salted) == canon(plain))
  }

  test("salted join rejects right/full join types") {
    val df = spark.range(1).toDF("k")
    val e = intercept[IllegalArgumentException] {
      Salting.saltedJoin(df, df, Seq("k"), col("k"), joinType = "full")
    }
    assert(e.getMessage.contains("inner/left"))
  }

  test("salted join joins on (key, salt) without broadcast (plan pin)") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import spark.implicits._
      val skewed = spark.range(0, 20000)
        .select(when(col("id") % 10 =!= lit(0L), lit(7L))
          .otherwise(col("id")).as("k"), col("id").as("v"))
      val other = spark.range(0, 200).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val joined = Salting.saltedJoin(skewed, other, Seq("k"), col("v"),
        buckets = 8)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_salt"),
        s"join keys must include the salt column:\n${plan.take(2000)}")
      assert(!plan.contains("BroadcastHashJoin"),
        "fixture must exercise the shuffle-join path")
      // the hot key's rows really spread across the salt range
      val spreadCount = skewed.filter(col("k") === 7L)
        .select(Salting.saltCol(col("v"), 8).as("s"))
        .distinct().count()
      assert(spreadCount == 8, s"hot key spread over $spreadCount/8 salts")
      // and the result still matches the plain join
      assert(canon(joined) == canon(skewed.join(other, Seq("k"))))
    }
  }

  test("AQE splits a skewed join partition at runtime (skew-join pin)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // 90% of 200k rows share one key: one reducer partition far above
      // 2× the median and the 32k byte threshold → AQE must replace the
      // full-partition read with PartialReducerPartitionSpec splits
      val skewed = spark.range(0, 200000)
        .select(when(col("id") % 10 =!= lit(0L), lit(7L))
          .otherwise(col("id")).as("k"), col("id").as("v"))
      val other = spark.range(0, 2000).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val joined = skewed.join(other, "k")
      // execute THIS dataframe's own QueryExecution (count() would build
      // and finalize a different one, leaving this plan un-adapted)
      joined.collect()
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val adaptive = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a
        case p => p.collectFirst { case a: AdaptiveSparkPlanExec => a }.get
      }
      // Spark 4 wraps the final plan in ResultQueryStage, whose inner plan
      // is not reachable via children/collect — pin on the plan rendering
      val finalPlan = adaptive.executedPlan.toString
      assert(finalPlan.contains("skew=true") &&
          finalPlan.contains("AQEShuffleRead skewed"),
        s"expected a runtime skew-split join in the final plan:\n$finalPlan")
    }
  }

  test("salt spreads a single hot key across buckets") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_returnflag") === "N") // one hot key
    val partials = li
      .select(Salting.saltCol(col("l_orderkey"), 16).as("salt"))
      .groupBy("salt").count().collect()
    assert(partials.length > 8, s"salt collapsed to ${partials.length} buckets")
  }
}
