package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: two-phase salted aggregation.
  *
  * A plain `groupBy(key).agg(sum)` sends every row of a hot key to one
  * reducer; at 100 TB one viral key stalls the stage. Salting splits each
  * key across `buckets` partial groups (phase 1: map-side-combined
  * partial sums per (key, salt)), then merges the tiny partial table
  * (phase 2: ≤ buckets rows per key). Total shuffle volume stays the
  * same order, but the max per-reducer fan-in drops by `buckets`.
  *
  * AQE's skew-join handling covers joins; this is the aggregation-side
  * equivalent, exposed as a reusable operator. Correctness holds for any
  * commutative/associative aggregate; use exact types (longs, decimals)
  * if the final result must be independent of the salt split.
  */
object Salting {

  /** Deterministic per-row salt in [0, buckets): derived from a spread
    * column (any high-cardinality column — an id, a line number), not
    * from rand(), so retried tasks produce identical output.
    */
  def saltCol(spreadBy: Column, buckets: Int): Column =
    pmod(xxhash64(spreadBy), lit(buckets.toLong))

  /** sum(valueExpr) grouped by `key`, skew-resistant. `valueExpr` must be
    * an exact (integral/decimal) expression for salt-invariant results.
    */
  def saltedSum(
      df: DataFrame,
      key: Column,
      spreadBy: Column,
      valueExpr: Column,
      buckets: Int = 16): DataFrame = {
    df.select(key.as("_k"), saltCol(spreadBy, buckets).as("_salt"),
        valueExpr.as("_v"))
      .groupBy(col("_k"), col("_salt"))
      .agg(sum(col("_v")).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col("_k"))
      .agg(sum(col("_partial")).as("sum_value"), sum(col("_n")).as("n_rows"))
      .withColumnRenamed("_k", "key")
  }
}
