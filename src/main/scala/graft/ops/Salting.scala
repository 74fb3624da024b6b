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

  /** Skew-resistant equi-join: the JOIN-side half of the skew story.
    *
    * A plain shuffle join on a skewed key sends every row of the hot key
    * to ONE reducer — the same meltdown as the aggregation case, but on
    * the join exchange. Salting fixes it the classic way: each row of the
    * `skewed` side gets a deterministic salt in [0, buckets); the `other`
    * side is REPLICATED once per salt value (explode over the salt range);
    * the join runs on (keys..., salt), so the hot key's rows spread over
    * `buckets` reducers instead of one.
    *
    * Cost model: the replicated side's shuffle volume grows ×buckets —
    * use this when `other` is mid-sized (too big to broadcast, small
    * relative to the skewed fact side) and AQE's skew splitting isn't
    * available or can't see the skew (e.g. skew materializes after
    * filters). When `other` CAN broadcast, just broadcast — salting a
    * broadcast join is pointless. AQE's runtime skew-join split
    * (pinned in SaltingSpec) handles the sort-merge case adaptively;
    * this operator is the explicit, planner-independent form.
    *
    * Only `inner` and `left` (skewed side preserved) are supported:
    * unmatched `other` rows exist `buckets` times on the replicated
    * side, so right/full outer would emit duplicate null-padded rows.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      spreadBy: Column,
      buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "leftouter")
        .contains(joinType.toLowerCase.replaceAll("[_ ]", "")),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val saltName = "_graft_salt"
    val s2 = skewed.withColumn(saltName, saltCol(spreadBy, buckets))
    val o2 = other.withColumn(saltName,
      explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
    s2.join(o2, keys :+ saltName, joinType).drop(saltName)
  }

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
