package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test / fork := true keeps it
  * in the test JVM). Mirrors the Verify/Bench session config so tests see
  * the same semantics as the driver gate (UTC, nanos-as-long).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // object-agg hash-map threshold — see GraftSession scaladoc
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
