package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{dec, load, loadEvents}
import graft.QueryDef

/** Advanced SQL-surface queries: the operator families a reference user
  * runs through Athena (README.md:37,49 in /root/reference/) that need
  * non-trivial Catalyst planning — multi-way join ordering, GROUPING
  * SETS expansion, generators (LATERAL/posexplode), correlated-subquery
  * decorrelation, multi-distinct Expand, and equi+range interval joins.
  *
  * Scale design (100 TB):
  *  - q48's plan keeps both fact tables (lineitem, orders) shuffled on
  *    their join keys once; nation/region are broadcast, so no fact
  *    shuffle happens on a dimension key.
  *  - q49 GROUPING SETS is one Expand + one hash aggregate — partial
  *    aggregation still applies before the shuffle.
  *  - q50's generator is narrow (no shuffle): rows expand inside the
  *    scan stage's codegen'd pipeline.
  *  - q51's correlated scalar subqueries decorrelate to one aggregate +
  *    broadcast-able join on the correlation key, not a per-row rescan.
  *  - q53's interval join carries an equality predicate (user = cust) so
  *    Spark plans a hash join with the range as a post-join filter —
  *    never a cartesian/BNLJ.
  */
object Advanced {

  // q48 — TPC-H Q5-shaped 6-table join: local-supplier revenue by nation.
  // Join-order stress: lineitem⋈orders⋈customer⋈supplier with the
  // customer-nation = supplier-nation constraint, dims broadcast.
  private def q48(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
    val o = load(s, dir, "orders")
    val c = load(s, dir, "customer")
    val su = load(s, dir, "supplier")
    val n = load(s, dir, "nation")
    val r = load(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(su, li("l_suppkey") === su("s_suppkey") &&
        c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DecimalType(38, 6)).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }
  private val q48Sql =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  // q49 — GROUPING SETS with grouping() flags: one Expand node feeding a
  // single partial-aggregatable hash aggregate (4 sets in one pass, vs 4
  // separate scans in engines without the expansion).
  private def q49(s: SparkSession, dir: String): DataFrame = {
    load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus), ())""".stripMargin)
  }
  private val q49Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), (l_linestatus), ())""".stripMargin

  // q50 — generator/LATERAL: positional token explode. The Generate node
  // runs inside the scan stage (narrow, codegen'd); the pos<8 filter
  // bounds fan-out. Oracle uses DuckDB's parallel UNNEST for ordinality.
  private def q50(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(col("pos") < 8)
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
  private val q50Sql =
    """SELECT doc_id, pos, tok FROM (
      |  SELECT doc_id, UNNEST(range(len(l))) AS pos, UNNEST(l) AS tok
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
      |WHERE pos < 8""".stripMargin

  // q51 — correlated scalar subqueries: orders priced above 1.5× their
  // customer's average. Exact cross-engine predicate: price > 1.5·avg
  // ⇔ 2·price·count > 3·sum, all in DECIMAL (no float division).
  // Catalyst decorrelates each subquery into an aggregate joined on the
  // correlation key — one pass over orders, not a rescan per row.
  private def q51(s: SparkSession, dir: String): DataFrame = {
    load(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE CAST(2 AS DECIMAL(18,6)) * CAST(o_totalprice AS DECIMAL(18,6)) *
        |    (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |  > CAST(3 AS DECIMAL(18,6)) *
        |    (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,6)))
        |     FROM orders o3 WHERE o3.o_custkey = o.o_custkey)""".stripMargin)
  }
  private val q51Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE CAST(2 AS DECIMAL(18,6)) * CAST(o_totalprice AS DECIMAL(18,6)) *
      |    (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |  > CAST(3 AS DECIMAL(18,6)) *
      |    (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,6)))
      |     FROM orders o3 WHERE o3.o_custkey = o.o_custkey)""".stripMargin

  // q52 — multiple DISTINCT aggregates in one group: Spark plans this as
  // one Expand (row per distinct-column) + two-level aggregate, keeping
  // partial aggregation; a naive engine would self-join per distinct.
  private def q52(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(date_trunc("month", col("o_orderdate"))).as("n_months"),
        count(lit(1)).as("n"))
  private val q52Sql =
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT o_custkey) AS n_cust,
      |  COUNT(DISTINCT DATE_TRUNC('month', o_orderdate)) AS n_months,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // q53 — interval join: per purchase, every click by the same user in
  // the preceding hour (the N:M attribution window; q27's as-of join is
  // the 1:1 latest-click variant). The user_id equality keys a hash
  // join; the time range is a post-join filter — the plan never
  // degrades to a cartesian product, so it scales like any equi-join.
  // Skew note: a hot user makes this join quadratic in that user's
  // events; at 100 TB bound the window (1 h here) and salt hot keys
  // (ops/Salting) so a single key's pairs stay in one executor's reach.
  private def q53(s: SparkSession, dir: String): DataFrame = {
    val e = loadEvents(s, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    p.join(c, Seq("user_id"))
      .filter(col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") < col("purchase_ts"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("purchase_id")).as("n_purchases"))
  }
  private val q53Sql =
    """SELECT p.user_id, COUNT(*) AS n_pairs,
      |  COUNT(DISTINCT p.event_id) AS n_purchases
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      |GROUP BY p.user_id""".stripMargin

  // q54 — NOT IN with a nullable list: ANSI three-valued logic. Any NULL
  // in the subquery list makes `x NOT IN (...)` UNKNOWN for every
  // non-matching x, so rows survive only when the list is null-free for
  // their partition of the predicate. Spark plans this as a
  // null-aware anti join; engines that rewrite NOT IN as a plain anti
  // join silently return wrong rows. Two arms prove both behaviors: the
  // null-free list keeps rows, the null-poisoned list yields none.
  private def q54(s: SparkSession, dir: String): DataFrame = {
    load(s, dir, "orders").createOrReplaceTempView("orders")
    load(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT 'null_free' AS variant, o_orderkey, o_custkey FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_custkey < 40)
        |  AND o_orderkey % 13 = 0
        |UNION ALL
        |SELECT 'null_poisoned' AS variant, o_orderkey, o_custkey FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey END
        |   FROM customer WHERE c_custkey < 40)
        |  AND o_orderkey % 13 = 0""".stripMargin)
  }
  private val q54Sql =
    """SELECT 'null_free' AS variant, o_orderkey, o_custkey FROM orders
      |WHERE o_custkey NOT IN
      |  (SELECT c_custkey FROM customer WHERE c_custkey < 40)
      |  AND o_orderkey % 13 = 0
      |UNION ALL
      |SELECT 'null_poisoned' AS variant, o_orderkey, o_custkey FROM orders
      |WHERE o_custkey NOT IN
      |  (SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey END
      |   FROM customer WHERE c_custkey < 40)
      |  AND o_orderkey % 13 = 0""".stripMargin

  // q55 — correlated EXISTS with an extra local predicate: plans as a
  // left-semi join on the correlation key with the predicate pushed into
  // the subquery scan — no per-row re-execution.
  private def q55(s: SparkSession, dir: String): DataFrame = {
    load(s, dir, "orders").createOrReplaceTempView("orders")
    load(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin)
  }
  private val q55Sql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin

  // q56 — LATERAL correlated subquery with ORDER BY + LIMIT: top-3
  // orders per customer, the join-shaped twin of q4's window ranking.
  // Catalyst decorrelates the lateral limit into a ranking window over
  // one shuffle by the correlation key — not a per-customer rescan of
  // orders. Deterministic tie-break on o_orderkey.
  private def q56(s: SparkSession, dir: String): DataFrame = {
    load(s, dir, "orders").createOrReplaceTempView("orders")
    load(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 3) t""".stripMargin)
  }
  private val q56Sql =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 3) t""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q48_local_supplier_revenue", q48, Some(q48Sql)),
    QueryDef("q49_grouping_sets", q49, Some(q49Sql)),
    QueryDef("q50_lateral_tokens", q50, Some(q50Sql)),
    QueryDef("q51_above_customer_avg", q51, Some(q51Sql)),
    QueryDef("q52_multi_distinct", q52, Some(q52Sql)),
    QueryDef("q53_interval_join", q53, Some(q53Sql)),
    QueryDef("q54_not_in_null_trap", q54, Some(q54Sql)),
    QueryDef("q55_exists_predicate", q55, Some(q55Sql)),
    QueryDef("q56_lateral_topk", q56, Some(q56Sql)),
  )
}
