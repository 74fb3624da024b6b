package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // q176 — SCD TYPE-2 history build: collapse each customer's order
  // sequence into [valid_from, valid_to) status intervals — the
  // warehouse "slowly changing dimension" maintenance op the reference
  // would need the moment its articles carried mutable attributes.
  // Classic gaps-and-islands: a change flag (status differs from the
  // lag) cumulative-summed into a version number, one aggregate per
  // (customer, version) island, then lead() turns each island's start
  // into the predecessor's exclusive end (NULL = current row, the open
  // interval). Total order inside a customer is (o_orderdate,
  // o_orderkey) — ties on date are broken by key, so both engines walk
  // the identical sequence.
  // Shape at 100 TB: every window and the aggregate share the ONE
  // customer-keyed exchange (same partitioning, different sort — sorts
  // are local); nothing else shuffles. History builds append-only:
  // with CDC (q79/q80) only changed customers' islands re-derive.
  private def q176(s: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val cum = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byVersion = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
    load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderstatus"))
      .withColumn("chg",
        when(lag(col("o_orderstatus"), 1).over(byCust).isNull ||
          lag(col("o_orderstatus"), 1).over(byCust) =!= col("o_orderstatus"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(cum))
      .groupBy(col("o_custkey"), col("version"))
      .agg(min(col("o_orderstatus")).as("status"),
        min(col("o_orderdate")).as("valid_from"),
        count(lit(1)).as("n_orders"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
  }
  private val q176Sql =
    """WITH seq AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
      |    CASE WHEN LAG(o_orderstatus) OVER w IS NULL
      |           OR LAG(o_orderstatus) OVER w <> o_orderstatus
      |         THEN 1 ELSE 0 END AS chg
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |versioned AS (
      |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
      |  FROM seq),
      |islands AS (
      |  SELECT o_custkey, version, MIN(o_orderstatus) AS status,
      |    MIN(o_orderdate) AS valid_from, COUNT(*) AS n_orders
      |  FROM versioned GROUP BY 1, 2)
      |SELECT o_custkey, version, status, valid_from, n_orders,
      |  LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
      |    AS valid_to,
      |  LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY version) IS NULL
      |    AS is_current
      |FROM islands""".stripMargin

  // q179 — BENFORD leading-digit audit on order totals: the
  // data-quality screen fraud and synthetic-data teams run on money
  // columns. Leading digit comes from exact integer cents (the DECIMAL
  // bridge — never a double-to-string format, which the two engines
  // spell differently); expected shares are the floored-permille
  // Benford table log10(1+1/d) as integer literals, so the comparison
  // is float-free end to end. The output IS the audit: per digit the
  // observed and expected permille and the signed delta (this synthetic
  // data is uniform-ish, so the deltas are the finding).
  // Shape at 100 TB: partial-agg groupBy on a 9-value key — map-side
  // combine reduces each partition to ≤9 rows before the exchange.
  private def q179(s: SparkSession, dir: String): DataFrame = {
    val expected = typedLit(Map(1 -> 301L, 2 -> 176L, 3 -> 124L, 4 -> 96L,
      5 -> 79L, 6 -> 66L, 7 -> 57L, 8 -> 51L, 9 -> 45L))
    val digits = load(s, dir, "orders")
      .select(substring((dec(col("o_totalprice")) * 100).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("total"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("n * 1000 div total").as("obs_permille"),
        element_at(expected, col("digit")).as("exp_permille"))
      .withColumn("delta_permille", col("obs_permille") - col("exp_permille"))
      .orderBy(col("digit"))
  }
  private val q179Sql =
    """WITH digits AS (
      |  SELECT CAST(SUBSTRING(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100
      |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
      |    COUNT(*) AS n
      |  FROM orders GROUP BY 1),
      |benford(digit, exp_permille) AS (VALUES
      |  (1, 301), (2, 176), (3, 124), (4, 96), (5, 79),
      |  (6, 66), (7, 57), (8, 51), (9, 45))
      |SELECT d.digit, d.n,
      |  CAST(d.n * 1000 // (SELECT SUM(n) FROM digits) AS BIGINT) AS obs_permille,
      |  CAST(b.exp_permille AS BIGINT) AS exp_permille,
      |  CAST(d.n * 1000 // (SELECT SUM(n) FROM digits)
      |    - b.exp_permille AS BIGINT) AS delta_permille
      |FROM digits d JOIN benford b USING (digit)
      |ORDER BY d.digit""".stripMargin

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
    QueryDef("q176_scd2_history", q176, Some(q176Sql)),
    QueryDef("q179_benford_audit", q179, Some(q179Sql)),
    QueryDef("q182_bootstrap_ci", q182, Some(q182Sql)),
    QueryDef("q186_ship_lag_sla", q186, Some(q186Sql)),
    QueryDef("q187_weighted_median", q187, Some(q187Sql)),
  )

  // q186 — order-to-SHIP lag SLA (TPC-H Q12's spirit on the columns
  // this fixture carries): join every line item to its order, lag =
  // days from order date to ship date, rolled up per order priority
  // into fixed SLA buckets (≤30 / ≤60 / ≤90 / >90 days) plus the exact
  // permille breach rate — the fulfilment-health dashboard row.
  // Shape at 100 TB: this is the canonical BIG-BIG join (lineitem ⋈
  // orders on orderkey). The projection carries two dates + one string,
  // so the shuffle is narrow; at warehouse scale both sides would be
  // bucketed by orderkey at ingest (ops/Bucketing — q64 pins the
  // zero-Exchange plan) making the join shuffle-free. The rollup after
  // it is a 5-key partial agg — free.
  private def q186(s: SparkSession, dir: String): DataFrame = {
    val o = load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate").cast("date").as("od"))
    val l = load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("sd"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_days", datediff(col("sd"), col("od")).cast("long"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        min(col("lag_days")).as("min_lag"), max(col("lag_days")).as("max_lag"),
        sum(when(col("lag_days") <= 30, 1L).otherwise(0L)).as("n_le30"),
        sum(when(col("lag_days") > 30 && col("lag_days") <= 60, 1L)
          .otherwise(0L)).as("n_le60"),
        sum(when(col("lag_days") > 60 && col("lag_days") <= 90, 1L)
          .otherwise(0L)).as("n_le90"),
        sum(when(col("lag_days") > 90, 1L).otherwise(0L)).as("n_breach"))
      .withColumn("breach_permille", expr("n_breach * 1000 div n_items"))
      .orderBy(col("o_orderpriority"))
  }
  private val q186Sql =
    """WITH j AS (
      |  SELECT o.o_orderpriority,
      |    DATEDIFF('day', CAST(o.o_orderdate AS DATE),
      |      CAST(l.l_shipdate AS DATE)) AS lag_days
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |agg AS (
      |  SELECT o_orderpriority, COUNT(*) AS n_items,
      |    CAST(MIN(lag_days) AS BIGINT) AS min_lag,
      |    CAST(MAX(lag_days) AS BIGINT) AS max_lag,
      |    CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_le30,
      |    CAST(SUM(CASE WHEN lag_days > 30 AND lag_days <= 60 THEN 1
      |      ELSE 0 END) AS BIGINT) AS n_le60,
      |    CAST(SUM(CASE WHEN lag_days > 60 AND lag_days <= 90 THEN 1
      |      ELSE 0 END) AS BIGINT) AS n_le90,
      |    CAST(SUM(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_breach
      |  FROM j GROUP BY o_orderpriority)
      |SELECT *, CAST(n_breach * 1000 // n_items AS BIGINT)
      |  AS breach_permille
      |FROM agg ORDER BY o_orderpriority""".stripMargin

  // q187 — WEIGHTED percentiles (p25/p50/p75 of line-item price,
  // weighted by quantity — "the price a median UNIT shipped at", not
  // the median line): the importance-weighted quantile every
  // mixture-weighted corpus statistic needs. Exact by construction:
  // values collapse to (flag, cents) with summed weights FIRST (the
  // compression that makes the window affordable — it runs over
  // distinct prices per flag, not raw rows), then one cumulative-sum
  // window; the p-th weighted percentile is the least value whose
  // cumulative weight covers p of the total, selected by integer
  // cross-multiplication (4·cumw ≥ p·totw — no floats, no
  // interpolation ambiguity).
  // Shape at 100 TB: partial-agg groupBy compresses before the one
  // flag-keyed exchange; window and final 1-row-per-flag agg reuse it.
  // The sketch twin for one-pass approximation is q72 (GK quantiles).
  private def q187(s: SparkSession, dir: String): DataFrame = {
    val byVal = load(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("w"))
      .groupBy(col("flag"), col("cents")).agg(sum(col("w")).as("wv"))
    val win = Window.partitionBy(col("flag")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("flag"))
    byVal
      .withColumn("cumw", sum(col("wv")).over(win))
      .withColumn("totw", sum(col("wv")).over(tot))
      .groupBy(col("flag"))
      .agg(max(col("totw")).as("total_weight"),
        // r14: the input is one row per (flag, cents) BY CONSTRUCTION
        // (the byVal groupBy), so COUNT(*) equals COUNT(DISTINCT cents)
        // — and dropping the distinct removes the Expand that doubled
        // every row through this aggregate (distinct-agg machinery for
        // a stream that is already distinct).
        count(lit(1)).as("n_values"),
        min(when(col("cumw") * 4 >= col("totw"), col("cents")))
          .as("wp25_cents"),
        min(when(col("cumw") * 2 >= col("totw"), col("cents")))
          .as("wp50_cents"),
        min(when(col("cumw") * 4 >= col("totw") * 3, col("cents")))
          .as("wp75_cents"))
      .orderBy(col("flag"))
  }
  private val q187Sql =
    """WITH bv AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 100 AS BIGINT)
      |      AS cents,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wv
      |  FROM lineitem GROUP BY 1, 2),
      |cw AS (
      |  SELECT flag, cents, wv,
      |    CAST(SUM(wv) OVER (PARTITION BY flag ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cumw,
      |    CAST(SUM(wv) OVER (PARTITION BY flag) AS BIGINT) AS totw
      |  FROM bv)
      |SELECT flag, MAX(totw) AS total_weight,
      |  COUNT(DISTINCT cents) AS n_values,
      |  CAST(MIN(CASE WHEN cumw * 4 >= totw THEN cents END) AS BIGINT)
      |    AS wp25_cents,
      |  CAST(MIN(CASE WHEN cumw * 2 >= totw THEN cents END) AS BIGINT)
      |    AS wp50_cents,
      |  CAST(MIN(CASE WHEN cumw * 4 >= totw * 3 THEN cents END) AS BIGINT)
      |    AS wp75_cents
      |FROM cw GROUP BY flag ORDER BY flag""".stripMargin

  // q182 — deterministic POISSON-BOOTSTRAP confidence interval for the
  // mean order value per priority (Chamandy et al., "Estimating
  // Uncertainty for Massive Data Streams" — the one-pass bootstrap that
  // works when the data cannot be resampled centrally). Each of 64
  // replicates reweights every order by a Poisson(1)-distributed count
  // w ∈ {0..4} drawn NOT from a RNG but from md5(o_orderkey ':' b)
  // reduced to a permille and thresholded at the Poisson(1) CDF
  // (368/736/920/981) — deterministic, engine-independent, stable
  // under re-partitioning. Replicate means are exact integer cents;
  // the interval is the 4th/61st order statistic of the 64 replicate
  // means (≈ the 5th/95th percentile), selected by rank — no floats
  // anywhere.
  // Shape at 100 TB: the ×64 replicate fan-out is narrow (explode of a
  // constant sequence — no shuffle carries it), and each (priority, b)
  // partial-aggregates map-side to ≤ 64·|priorities| rows; the rank
  // window then runs on 64 rows per priority. One scan, one tiny
  // exchange — uncertainty for free at any scale.
  private def q182(s: SparkSession, dir: String): DataFrame = {
    val cents = load(s, dir, "orders").select(
      col("o_orderpriority").as("priority"), col("o_orderkey"),
      (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
    // native H60Expr (top 60 md5-digest bits, bit-identical to the
    // conv(substring(md5(…),1,15),16,10) chain — PropertySpec-pinned):
    // the declarative chain materializes a 32-char hex string per
    // (order × replicate) row — 9.6M at sf0.1 — and was the dominant
    // cost once the bench action stopped pruning it (r07)
    val h60u = graft.functions.H60Expr.column(
      concat(col("o_orderkey").cast("string"), lit(":"),
        col("b").cast("string")))
    // the ×64 explode amplifies per-row CPU 64-fold (one md5 per
    // order×replicate); parallelism for that stage must come from the
    // session, not the scan's split count — see [[graft.ops.Fanout]]
    val reps = graft.ops.Fanout.rebalance(cents)
      .withColumn("b", explode(expr("sequence(0, 63)")))
      .withColumn("u", h60u % 1000)
      .withColumn("w", when(col("u") < 368, 0L).when(col("u") < 736, 1L)
        .when(col("u") < 920, 2L).when(col("u") < 981, 3L).otherwise(4L))
      .groupBy(col("priority"), col("b"))
      .agg(expr("sum(w * cents) div NULLIF(sum(w), 0)").as("rep_mean_cents"))
    val ranked = reps.withColumn("r", row_number().over(
      Window.partitionBy(col("priority"))
        .orderBy(col("rep_mean_cents"), col("b"))))
    val ci = ranked.groupBy(col("priority")).agg(
      count(lit(1)).as("n_reps"),
      min(when(col("r") === 4, col("rep_mean_cents"))).as("boot_lo_cents"),
      min(when(col("r") === 61, col("rep_mean_cents"))).as("boot_hi_cents"))
    val point = cents.groupBy(col("priority")).agg(
      count(lit(1)).as("n_orders"),
      expr("sum(cents) div count(1)").as("mean_cents"))
    point.join(ci, Seq("priority")).orderBy(col("priority"))
  }
  private val q182Sql =
    """WITH cents AS (
      |  SELECT o_orderpriority AS priority, o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |expanded AS (
      |  SELECT c.priority, c.cents, g.b,
      |    CAST('0x' || SUBSTRING(MD5(CAST(c.o_orderkey AS VARCHAR) || ':'
      |      || CAST(g.b AS VARCHAR)), 1, 15) AS BIGINT) % 1000 AS u
      |  FROM cents c CROSS JOIN
      |    (SELECT UNNEST(GENERATE_SERIES(0, 63)) AS b) g),
      |reps AS (
      |  SELECT priority, b,
      |    CAST(SUM(w * cents) // NULLIF(SUM(w), 0) AS BIGINT)
      |      AS rep_mean_cents
      |  FROM (SELECT priority, cents, b,
      |          CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1
      |               WHEN u < 920 THEN 2 WHEN u < 981 THEN 3
      |               ELSE 4 END AS w
      |        FROM expanded) t
      |  GROUP BY priority, b),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY priority
      |    ORDER BY rep_mean_cents, b) AS r
      |  FROM reps),
      |ci AS (
      |  SELECT priority, COUNT(*) AS n_reps,
      |    CAST(MIN(CASE WHEN r = 4 THEN rep_mean_cents END) AS BIGINT)
      |      AS boot_lo_cents,
      |    CAST(MIN(CASE WHEN r = 61 THEN rep_mean_cents END) AS BIGINT)
      |      AS boot_hi_cents
      |  FROM ranked GROUP BY priority),
      |point AS (
      |  SELECT priority, COUNT(*) AS n_orders,
      |    CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean_cents
      |  FROM cents GROUP BY priority)
      |SELECT p.priority, p.n_orders, p.mean_cents,
      |  c.n_reps, c.boot_lo_cents, c.boot_hi_cents
      |FROM point p JOIN ci c USING (priority)
      |ORDER BY p.priority""".stripMargin
}
