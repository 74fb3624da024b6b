package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Incremental aggregate maintenance: keep a per-key state table
  * (counts/sums/mins/maxes) current by COMBINING pre-aggregated states
  * instead of rescanning the corpus — the batch twin of a streaming
  * stateful aggregation, and the only sane shape at 100 TB where the
  * history is petabytes and the daily delta is gigabytes.
  *
  * The merge is deliberately NOT a join: states union and re-aggregate,
  * because every mergeable metric is closed under its own combiner
  * (sum∘sum, min∘min, max∘max, count via sum). That keeps the merge
  * partial-aggregatable (map-side combine before one shuffle on the
  * key), handles brand-new keys for free, and generalizes to N states —
  * a full-outer-join formulation does none of those. Non-mergeable
  * metrics (exact distinct, medians) need sketch states instead
  * (HLL/KLL — see q72 for how sketch estimates are gated: exact twins
  * plus within-tolerance booleans, since raw estimates aren't
  * cross-engine comparable).
  *
  * The state table itself should live bucketed by the key
  * ([[Bucketing]]): then the merge shuffle moves ONLY the delta state.
  */
object IncrementalAgg {

  /** Combine pre-aggregated state frames (identical schemas: `keys` ++
    * metric columns) by re-aggregating each metric with its combiner.
    */
  def combine(
      states: Seq[DataFrame],
      keys: Seq[String],
      merges: Seq[(String, Column => Column)]): DataFrame = {
    require(states.nonEmpty, "no states to combine")
    require(merges.nonEmpty, "no mergeable metrics")
    val unioned = states.reduce(_ unionByName _)
    val aggs = merges.map { case (name, f) => f(col(name)).as(name) }
    unioned.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
