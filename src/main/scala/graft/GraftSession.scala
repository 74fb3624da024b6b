package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession builder pre-configured with the
  * engine's recommended settings — the one-liner a user of the reference
  * would call to switch.
  *
  *   val spark = GraftSession.builder().getOrCreate()
  *
  * Defaults: custom functions injected via [[GraftExtensions]], AQE on
  * (runtime re-planning: post-shuffle coalescing + skew-join splitting),
  * UTC session time, nanos-as-long for TIMESTAMP(NANOS) parquet, and
  * shuffle parallelism from SPARK_GRAFT_CPUS rather than the 200-
  * partition default (wrong for local mode, overridden per-cluster).
  */
object GraftSession {

  def builder(
      master: String = sys.env.getOrElse("SPARK_MASTER", "local[*]"),
      appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
