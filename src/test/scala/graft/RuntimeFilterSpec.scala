package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter injection (`InjectRuntimeFilter`) — the third
  * Catalyst scan-saver next to static partition pruning (PlanSpec) and
  * DPP (q201): a selective dimension predicate is turned into a Bloom
  * filter built on the dimension's join keys and applied to the FACT
  * scan before the shuffle, so rows that cannot join never pay the
  * exchange. Off by default economics (the application side must scan
  * ≥ 10 GB — exactly the 100 TB regime); the thresholds here are
  * lowered only to make the injection observable at fixture scale.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def withRuntimeFilterConfs[A](f: => A): A = {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffle-join shape the filter exists for (a broadcast
      // join already prunes at the probe; nothing to inject)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def factJoin = {
    val part = Tables.load(spark, dir, "part")
      .filter(col("p_size") === 1)
      .select(col("p_partkey"))
    Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).as("qty"))
  }

  test("a selective dim predicate injects a Bloom filter on the fact scan side") {
    withRuntimeFilterConfs {
      val df = factJoin
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("might_contain"),
        s"no bloom-filter injection in optimized plan:\n$optimized")
      df.collect() // collect-scale: test assertion, finalize AQE
      val p = df.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("might_contain"),
        s"no bloom filter in executed plan:\n$p")
    }
  }

  test("the injected filter is semantically invisible (same result with it off)") {
    val expected = {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      try factJoin.collect().toSet // collect-scale: test assertion, grouped rows
      finally spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
    }
    val filtered = withRuntimeFilterConfs {
      factJoin.collect().toSet // collect-scale: test assertion, grouped rows
    }
    assert(filtered == expected && expected.nonEmpty)
  }
}
