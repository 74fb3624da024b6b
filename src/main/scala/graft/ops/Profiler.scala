package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the data-quality report a pipeline
  * owner runs before pointing 1000 executors at a new corpus drop:
  * per-column row/null/distinct counts and canonical min/max, emitted in
  * long form (one row per column) so profiles of different tables union
  * into one quality dashboard.
  *
  * Scale design (100 TB): ALL columns profile in ONE scan — the metrics
  * are packed into a single wide aggregate and unpivoted afterwards with
  * `stack` (narrow, 1×C rows). Count/min/max are partial-aggregatable;
  * the exact distincts expand the aggregate (one Expand row per column,
  * Spark's standard multi-distinct plan — see q52) and shuffle only
  * (column, value) pairs. At petabyte scale you'd swap
  * `count_distinct` for `approx_count_distinct` (HLL++, fully partial-
  * aggregatable, no Expand) — estimates aren't cross-engine comparable,
  * so the oracle-gated form keeps exact counts (same trade documented at
  * q72).
  *
  * Min/max canonicalization: values are rendered through a caller-chosen
  * canonical column (e.g. double→DECIMAL(18,6), timestamp→DATE) BEFORE
  * min/max, then cast to string — order is preserved inside one type and
  * the rendering is engine-portable (raw double→string formatting is
  * not: Java shortest-repr vs C++ printf disagree).
  */
object Profiler {

  /** Profile `cols` of `df` in one aggregate pass.
    *
    * @param repr per-column canonicalizer applied before min/max
    *             (defaults to the raw column)
    * @return one row per profiled column:
    *         (column_name, n_rows, n_nulls, n_distinct, min_repr, max_repr)
    */
  def profile(
      df: DataFrame,
      cols: Seq[String],
      repr: Map[String, Column => Column] = Map.empty): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      val r = repr.getOrElse(c, identity[Column] _)
      Seq(
        count(col(c)).as(s"${c}__n"),
        count_distinct(col(c)).as(s"${c}__d"),
        min(r(col(c))).cast("string").as(s"${c}__min"),
        max(r(col(c))).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `${c}__n`, `${c}__d`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    one
      .selectExpr(
        "__rows",
        s"stack(${cols.size}, $stackArgs) AS (column_name, __n, n_distinct, min_repr, max_repr)")
      .select(
        col("column_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col("__n")).as("n_nulls"),
        col("n_distinct"),
        col("min_repr"),
        col("max_repr"))
  }
}
