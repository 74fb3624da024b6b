package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured shuffle economics — the "measure, don't assert" pattern
  * (q163 zone maps, q201 DPP) applied to the repo's central 100 TB
  * claim: fingerprint-FIRST exact dedup (q58) moves a fraction of the
  * bytes that raw-text dedup (q13) moves, because the map side reduces
  * each document to its 32-byte md5 BEFORE the exchange.
  *
  * Until now that claim lived in scaladoc (`TextOps.scala` q58 comment)
  * and in ARCHITECTURE.md; here it becomes a number read off the
  * executed plan's own `ShuffleExchangeExec` metrics. At sf0.01 the
  * documents table averages ~300 chars/doc vs a 32-char hex digest, so
  * the exchange payload ratio should be severalfold even after shuffle
  * compression.
  */
class ShuffleProofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  /** All plan nodes, recursing through AQE wrappers (same traversal as
    * PlanSpec's q201 DPP pin: QueryStageExec children are Nil; the
    * materialized subtree hangs off `.plan`).
    */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case q: QueryStageExec        => nodes(q.plan)
    case other                    => other.children.flatMap(nodes)
  })

  /** Runs the frame and returns (bytesWritten, dataSize) summed over
    * every shuffle exchange in the executed plan. `shuffleBytesWritten`
    * is post-compression wire bytes; `dataSize` is the uncompressed
    * exchange payload.
    */
  private def shuffleBytes(df: DataFrame): (Long, Long) = {
    df.collect()
    val exchanges = nodes(df.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeExec => s
    }
    assert(exchanges.nonEmpty, "expected at least one shuffle exchange")
    val wire = exchanges.map(_.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)).sum
    val data = exchanges.map(_.metrics.get("dataSize").map(_.value).getOrElse(0L)).sum
    (wire, data)
  }

  // The two dedup shapes, built directly on the loaded table (no input
  // spread, so the ONLY exchange in each plan is the dedup groupBy's).
  private def naiveTextDedup: DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))

  private def fingerprintFirstDedup: DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))

  test("q58 shape: fingerprint-first dedup exchanges a fraction of q13's raw-text bytes") {
    val (naiveWire, naiveData) = shuffleBytes(naiveTextDedup)
    val (fpWire, fpData)       = shuffleBytes(fingerprintFirstDedup)
    info(s"raw-text dedup exchange: $naiveData B uncompressed, $naiveWire B on the wire")
    info(s"fingerprint-first dedup: $fpData B uncompressed, $fpWire B on the wire")
    // Uncompressed payload: ~300-char texts vs 32-char digests → ≥3×.
    assert(fpData * 3 <= naiveData,
      s"fingerprint exchange ($fpData B) not ≥3× smaller than text exchange ($naiveData B)")
    // And it must still win after shuffle compression (lz4 favors the
    // repetitive synthetic text, so the wire margin is thinner).
    assert(fpWire < naiveWire,
      s"fingerprint exchange ($fpWire B wire) not smaller than text exchange ($naiveWire B wire)")
  }

  test("RunCount's range exchange moves a fifth of the windowed form's rows") {
    // q165's scalable run counter (ops/RunCount) claims ONE range
    // exchange of the 5-column base frame, where the pre-r07 windowed
    // form exploded to long format and exchanged numColumns× the rows
    // (hash-partitioned by col_name — parallelism = 5). Pin the ratio
    // off the exchanges' own record metrics.
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag").as("rf"),
        col("l_linestatus").as("ls"),
        col("l_quantity").cast("long").cast("string").as("qty"),
        col("l_shipdate").cast("date").cast("string").as("sd"),
        col("l_suppkey").cast("string").as("sk"))
    val vals = Seq("rf", "ls", "qty", "sd", "sk")
    // RunCount's only data-scale exchange, measured as a DataFrame
    // (the operator consumes it via .rdd, which hides the exchange
    // from the summary frame's own plan)
    val ranged = li.repartitionByRange(col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
    // the windowed form's exchange: explode to long, hash by col_name
    val long = li.select(col("l_orderkey"), col("l_linenumber"),
        explode(array(vals.map(n =>
          struct(lit(n).as("col_name"), col(n).as("val"))): _*)).as("s"))
      .repartition(col("s.col_name"))
    def records(df: DataFrame): Long = {
      df.collect()
      val ex = nodes(df.queryExecution.executedPlan).collect {
        case s: ShuffleExchangeExec => s
      }
      assert(ex.nonEmpty, "expected a shuffle exchange")
      ex.map(_.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum
    }
    val wide = records(ranged)
    val longRecs = records(long)
    info(s"RunCount range exchange: $wide records; windowed long-format exchange: $longRecs records")
    assert(wide * vals.length == longRecs,
      s"expected exactly ${vals.length}x: $wide vs $longRecs")
  }

  test("q182's ×64 amplifier stage runs BEHIND the fan-out rebalance, at session width") {
    // Fanout.rebalance exists because the replicate explode's 9.6M md5s
    // otherwise inherit the single-row-group scan's ONE split (r07:
    // min 3.5 s single-task → 1.1 s spread). Pin the mechanism, not the
    // timing: the executed plan must carry a round-robin exchange, and
    // the h60 projection must sit above it (downstream of the spread),
    // so deleting the rebalance — or placing it after the amplifier —
    // fails here rather than resurfacing as a silent bench regression.
    val df = SparkEntry.queries("q182_bootstrap_ci")(spark, dir)
    df.collect()
    val all = nodes(df.queryExecution.executedPlan)
    def one(p: SparkPlan) = p.simpleString(160) // single node, not subtree
    val rr = all.indexWhere(one(_).startsWith("Exchange RoundRobinPartitioning"))
    assert(rr >= 0, "q182 lost its Fanout.rebalance round-robin exchange")
    // pre-order: ancestors precede the exchange — the amplifier
    // projection must be one of them (i.e. downstream of the spread)
    val h60Above = all.take(rr).exists(p =>
      one(p).startsWith("Project") && one(p).contains("h60("))
    assert(h60Above,
      "the h60 amplifier projection is not downstream of the rebalance")
  }

  test("both dedup shapes combine map-side before their exchange (partial aggregation)") {
    // The byte win composes with partial aggregation: on duplicate-heavy
    // data the map side also collapses copies before the wire. Pin that
    // both plans aggregate partially (no raw-row exchange at all).
    for (df <- Seq(naiveTextDedup, fingerprintFirstDedup)) {
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("partial_min") || p.contains("partial_count"),
        s"no map-side partial aggregation in:\n$p")
    }
  }

  test("distributedNtile matches the global ntile window bit-for-bit, without its single-partition sort") {
    // the r09 probe measured q163/q192's global ntile window at ~8.4×
    // wall-clock for 10× rows (everything through one sorted
    // partition); the distributed form (GlobalIndex rank + closed-form
    // bucket function) must be BIT-EQUAL on a ragged row count (the
    // first N mod 32 buckets take the extra row) while planning no
    // single-partition exchange
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .filter(col("l_partkey") > 5)
    val n = li.count()
    assert(n % 32 != 0, s"fixture drifted: need a ragged bucket split, n=$n")
    val order = Seq(col("l_orderkey"), col("l_linenumber"))
    val dist = graft.queries.ScaleOps.distributedNtile(li, n, 32, order)
      .select("l_orderkey", "l_linenumber", "chunk")
    import org.apache.spark.sql.expressions.Window
    val win = li.withColumn("chunk",
      // window-scale: test oracle — the serial truth the distributed
      // twin must reproduce, sf0.01 only
      ntile(32).over(Window.orderBy(order: _*)))
      .select("l_orderkey", "l_linenumber", "chunk")
    assert(dist.collect().map(_.toSeq).toSet == win.collect().map(_.toSeq).toSet)
    // plan shape: every exchange in the distributed form is session-wide
    val singles = nodes(dist.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeExec if s.outputPartitioning.numPartitions == 1 => s
    }
    assert(singles.isEmpty, "distributedNtile must not gather to one partition")

    // edge: fewer rows than buckets (q = 0) — ntile gives each row its
    // own bucket 1..N in order; the closed form must match
    val tiny = Tables.load(spark, dir, "region")
      .select(col("r_regionkey"))
    val tn = tiny.count()
    assert(tn < 32)
    val tDist = graft.queries.ScaleOps.distributedNtile(
        tiny, tn, 32, Seq(col("r_regionkey")))
      .collect().map(r => (r.getAs[Long]("r_regionkey"), r.getAs[Int]("chunk"))).toSet
    import org.apache.spark.sql.expressions.Window
    val tWin = tiny.withColumn("chunk",
      // window-scale: test oracle — 5-row frame
      ntile(32).over(Window.orderBy(col("r_regionkey"))))
      .collect().map(r => (r.getAs[Long]("r_regionkey"), r.getAs[Int]("chunk"))).toSet
    assert(tDist == tWin)
  }
}
