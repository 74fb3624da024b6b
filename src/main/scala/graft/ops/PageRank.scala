package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank by fixed-iteration power method — the standard
  * importance score over a link/citation/domain graph (Page et al.
  * 1999), used in training-data curation to weight sources by their
  * position in the web graph (e.g. CommonCrawl host ranking).
  *
  * FIXED-POINT INTEGER arithmetic throughout: ranks are BIGINTs in units
  * of 1/scale, contributions are `(r * w) div W` (floor division), and
  * the damping step is `(15 * scale) / 100 + (85 * Σcontrib) div 100` —
  * every operation is exact integer math, so the result is bit-identical
  * across engines and re-runs (float PageRank is order-dependent in its
  * Σcontrib and can't pass a bitwise gate). With scale = 10^12 the
  * truncation error per step is ≤ deg(v) ulps — ~12 orders below the
  * rank mass.
  *
  * Scale design (100 TB graph): each iteration is one join
  * (edges ⋈ ranks on src — co-partitioned if both are bucketed by src,
  * so the per-iteration shuffle moves only the rank table, never the
  * edges) and one partial-aggregatable sum on dst. Dangling mass is
  * dropped (nodes with no out-edges contribute nothing), the standard
  * simplification. For many iterations, checkpoint the rank frame per
  * round exactly as [[ConnectedComponents]] does — 3 iterations keeps
  * the plan tree small enough to skip that here.
  */
object PageRank {

  /** @param nodes one column `node` (BIGINT), the full vertex set
    * @param edges columns `src`, `dst`, `w` (BIGINT weight > 0)
    * @return (node, rank_scaled BIGINT) after `iterations` damped steps
    *         from the uniform start rank = scale
    */
  def ranks(
      nodes: DataFrame,
      edges: DataFrame,
      iterations: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "at least one iteration")
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val e = edges.join(outW, "src")
      .select(col("src"), col("dst"), col("w"), col("wout"))
    val base = (15L * scale) / 100L
    var r = nodes.select(col("node"), lit(scale).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = e.join(r, e("src") === r("node"))
        .select(col("dst"), expr("(r * w) div wout").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      r = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(cs, 0L)) div 100")).as("r"))
    }
    r.select(col("node"), col("r").as("rank_scaled"))
  }

  /** DuckDB rendering of the same fixed-point iteration, unrolled:
    * `nodesCte` must define nodes(node), `edgesCte` edges(src,dst,w). */
  def ranksSql(iterations: Int, scale: Long = 1000000000000L): String = {
    val base = (15L * scale) / 100L
    val steps = (1 to iterations).map { i =>
      s"""c$i AS (
        |  SELECT e.dst AS node,
        |    CAST(SUM((r${i - 1}.r * e.w) // o.wout) AS BIGINT) AS cs
        |  FROM edges e JOIN outw o ON e.src = o.src
        |  JOIN r${i - 1} ON r${i - 1}.node = e.src
        |  GROUP BY e.dst),
        |r$i AS (
        |  SELECT n.node, $base + (85 * COALESCE(c$i.cs, 0)) // 100 AS r
        |  FROM nodes n LEFT JOIN c$i ON n.node = c$i.node)""".stripMargin
    }
    s"""outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM edges GROUP BY src),
      |r0 AS (SELECT node, CAST($scale AS BIGINT) AS r FROM nodes),
      |${steps.mkString(",\n")}""".stripMargin
  }
}
