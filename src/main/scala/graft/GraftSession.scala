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

  /** Session confs every graft entry point shares (Verify/Bench/
    * BenchOne/Explain/tests apply these on top of their own master and
    * parallelism settings — one definition, six call sites).
    */
  val sharedConfs: Seq[(String, String)] = Seq(
    "spark.sql.session.timeZone" -> "UTC",
    // if an upstream writer ships TIMESTAMP(NANOS) parquet, read it as
    // long rather than erroring; graft.Tables.normalizeEventTs rebuilds
    // µs timestamps (part of the flavor-proof load boundary — NTZ and
    // µs-UTC flavors are handled there too)
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // ObjectHashAggregate (collect_list / typed Aggregators, e.g. q57's
    // BoundedCollectAggregator) falls back to SORT-based aggregation
    // after 128 distinct keys per partition — a full sort of the
    // pre-shuffle frame. The hash map is the right plan whenever
    // per-key state is bounded, which holds for every object agg in
    // this engine.
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "10000000",
    "spark.ui.enabled" -> "false")

  /** Apply [[sharedConfs]] to any builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    sharedConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Driver-entry local session (Bench/BenchOne/Verify): local[cpus]
    * master, cpus shuffle partitions, [[sharedConfs]], plus `extra` —
    * ONE definition so a conf added for one entry point cannot silently
    * miss another (the round-5 codegen-cache lesson: Bench and Verify
    * sized the cache differently until the split was found by
    * measurement).
    */
  def localSession(cpus: String, extra: Seq[(String, String)] = Nil): SparkSession = {
    val spark = extra.foldLeft(
        tune(SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus))) {
        case (b, (k, v)) => b.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def builder(
      master: String = sys.env.getOrElse("SPARK_MASTER", "local[*]"),
      appName: String = "graft"): SparkSession.Builder =
    tune(SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
}
