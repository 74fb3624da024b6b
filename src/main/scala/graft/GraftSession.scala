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
      // ObjectHashAggregate (the exec behind collect_list / typed
      // Aggregators, e.g. q57's BoundedCollectAggregator) falls back to
      // SORT-based aggregation after 128 distinct keys per partition —
      // a full sort of the pre-shuffle frame. The hash map is the right
      // plan whenever per-key state is bounded, which holds for every
      // object agg in this engine; set it once, at session scope, rather
      // than mutating the shared session from inside a query builder.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
}
