package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime re-planning pins. GraftSession documents AQE as one of the
  * engine's two skew answers (salting being the explicit one, q63/q88);
  * until now nothing proved the adaptive path actually fires. Both tests
  * here read the decision off the executed plan, not off configuration:
  * a hot key must be SPLIT by OptimizeSkewedJoin, and an over-partitioned
  * small shuffle must be COALESCED.
  *
  * Thresholds are scaled down to fixture size (the knobs a 100 TB
  * deployment leaves at their defaults — 256 MB skew threshold, 64 MB
  * advisory target); the decision logic exercised is the same.
  */
class AdaptiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Run `body` with confs set, restoring previous values after. */
  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition (skew=true in the executed plan)") {
    // one hot key (0) carrying ~90% of rows with an incompressible
    // ~256-byte payload; joined against a uniform build side too large
    // to broadcast under the test threshold
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32768",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      // keep the post-shuffle coalescer from merging the probes first
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val payload = repeat(md5(col("id").cast("string")), 8).as("payload")
      val left = spark.range(0, 30000)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"), payload)
      val right = spark.range(0, 3000)
        .select((col("id") % 100).as("k"), md5(col("id").cast("string")).as("tag"))
      // the aggregate must CONSUME the payload: count(1) alone lets
      // column pruning strip it before the exchange, leaving every
      // partition under the skew threshold
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
      val row = joined.collect().head // collect THIS frame: head() plans its own limit
      assert(row.getLong(0) > 0 && row.getLong(1) > 0)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true") || p.contains("skewed"),
        s"AQE did not mark the hot partition as skewed:\n$p")
    }
  }

  test("AQE coalesces an over-partitioned small shuffle") {
    withConfs(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "64",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m") {
      val df = spark.range(0, 1000)
        .select((col("id") % 50).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("AQEShuffleRead coalesced"),
        s"64-partition shuffle of 50 tiny keys was not coalesced:\n$p")
    }
  }
}
