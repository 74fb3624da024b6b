package graft.ops

import org.apache.spark.sql.DataFrame

/** Rebalance a narrow input ahead of a WORK-AMPLIFYING stage.
  *
  * Scan parallelism follows input BYTES: Spark sizes file splits by
  * `maxPartitionBytes` / `openCostInBytes` over the scanned files, and a
  * parquet row group is only ever read by one task. That is the right
  * geometry when downstream cost is proportional to bytes scanned — and
  * exactly wrong for a stage that multiplies work per input row: a ×64
  * replicate explode (q182), per-token hashing into 60 vote sums
  * (simhash), per-shingle MinHash banding. There the stage's CPU is k×
  * the scan's, so its parallelism should be the session's cores, not the
  * scan's split count. One round-robin exchange of the narrow projected
  * input buys that decoupling.
  *
  * Shape at 100 TB: the exchange carries only the projected columns the
  * amplifier needs (project BEFORE calling this), which is cheap relative
  * to the amplified CPU it spreads; it also protects against stragglers
  * when scan splits are few or skewed (a handful of giant row groups, a
  * small dimension feeding a big fan-out). When the scan already yields
  * thousands of healthy splits the exchange is ~neutral — the knob to
  * skip it is deleting one call, not re-deriving the plan. AQE cannot do
  * this re-plan: it only rebalances AFTER a shuffle exists, and a
  * scan→explode→project pipeline has none.
  *
  * Determinism: Spark sorts partition contents before round-robin
  * repartition (`spark.sql.execution.sortBeforeRepartition`, default
  * true), so retries are deterministic; every caller here feeds an
  * aggregation whose result is partitioning-invariant anyway. Do NOT use
  * ahead of `monotonically_increasing_id`/`spark_partition_id` logic —
  * those observe the layout (GlobalIndex documents its own contract).
  */
object Fanout {

  /** One narrow exchange to session parallelism, ahead of an amplifier. */
  def rebalance(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
