package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{dec, load}
import graft.QueryDef

/** The skew/layout toolkit ([[graft.ops.Salting]], [[graft.ops.Bucketing]])
  * driven through the oracle gate. Both operators are pure execution
  * strategies — salting splits hot keys across partial groups, bucketing
  * moves the join shuffle to ingest time — so their RESULTS must equal
  * the plain forms the oracle computes; the gate proves the rewrites are
  * semantics-preserving, and the unit specs (SaltingSpec/BucketingSpec)
  * pin the plan shapes.
  */
object ScaleOps {

  // q63 — two-phase salted aggregation: sum of order totals per order
  // status (3 hot keys over 150k rows at sf0.1 — exactly the shape where
  // one reducer per key stalls at scale). Decimal micro-units keep the
  // result independent of how the salt split the partial sums.
  private def q63(s: SparkSession, dir: String): DataFrame =
    graft.ops.Salting.saltedSum(
        load(s, dir, "orders"),
        key = col("o_orderstatus"),
        spreadBy = col("o_orderkey"),
        valueExpr = dec(col("o_totalprice")),
        buckets = 16)
      .select(col("key"), col("sum_value").cast("double").as("sum_value"),
        col("n_rows"))
  private val q63Sql =
    """SELECT o_orderstatus AS key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
      |  COUNT(*) AS n_rows
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  // q64 — bucketed co-located join: orders ⋈ lineitem on the order key,
  // with both sides written bucketed+sorted by the key first, so the
  // join itself plans with NO exchange (the dominant 100 TB shuffle
  // moved to ingest time). The oracle replays the plain join — results
  // must be layout-invariant.
  //
  // Bench note: ~3 s at sf0.1, of which nearly all is the two bucketed
  // WRITES — deliberately inside the query so the gate covers the whole
  // operator. That cost is ingest-time by definition: in production it
  // is paid once and amortized over every subsequent co-located join.
  private def q64(s: SparkSession, dir: String): DataFrame = {
    val wh = "/tmp/graft_bucketed"
    graft.ops.Bucketing.writeBucketed(
      load(s, dir, "orders").select(col("o_orderkey").as("okey"),
        col("o_orderstatus")),
      "graft_bucket_orders", s"$wh/orders", "okey", 8)
    graft.ops.Bucketing.writeBucketed(
      load(s, dir, "lineitem").select(col("l_orderkey").as("okey"),
        col("l_quantity")),
      "graft_bucket_lineitem", s"$wh/lineitem", "okey", 8)
    graft.ops.Bucketing
      .coLocatedJoin(s, "graft_bucket_orders", "graft_bucket_lineitem", "okey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
  }
  private val q64Sql =
    """SELECT o_orderstatus,
      |  COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q63_salted_agg", q63, Some(q63Sql)),
    QueryDef("q64_bucketed_join", q64, Some(q64Sql)),
  )
}
