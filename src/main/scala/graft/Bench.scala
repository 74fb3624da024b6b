package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, row_number}

/** Driver-facing benchmark: runs every catalog query at
  * `SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_REPS` reps each (default 3), and
  * reports the per-query MEDIAN — single-rep numbers on this host carry
  * multi-x scheduling spikes (observed ~95% idle CPU during stalls) that
  * moved between queries run to run and inflated round-1's official
  * total 4x over steady state.
  *
  * The JSON line is printed to stdout AND written to `BENCH_LOCAL.json`
  * (or `SPARK_GRAFT_BENCH_OUT`): round 1's driver record had
  * `"parsed": null` because the line arrived through sbt's logger with
  * an `info]` prefix — build.sbt now also sets `run / outputStrategy :=
  * StdoutOutput` so the line reaches stdout unprefixed.
  */
object Bench {

  /** Bench-session confs beyond [[GraftSession.sharedConfs]] — a `val`
    * so BenchConfSpec can pin the codegen-cache fix against regression
    * (VERDICT r06 item 5). 200 queries × several codegen'd stages each
    * overflow the default 100-entry generated-class cache, forcing
    * recompilation in the timed pass right after the warm-up compiled
    * everything. Round 5 measured 30-80% inflation on unchanged plans
    * when the suite doubled past the old 2000-entry cap (r04 87-query
    * times vs r05 190-query times, same plans — see ARCHITECTURE §6d);
    * 10000 entries gives the 200-query suite the same headroom the
    * 87-query suite had at 2000.
    */
  val benchConfs: Seq[(String, String)] = Seq(
    "spark.sql.codegen.cache.maxEntries" -> "10000")

  /** The timed bench action, shared by Bench and BenchOne so their
    * numbers stay comparable: full-column materialization through the
    * noop sink. NEVER count() — Catalyst prunes every computed column
    * under `Aggregate(count(1))` (see the methodology note in main).
    */
  def exhaust(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 5 interleaved reps: the median tolerates two host-stall hits per
    // query (observed stall windows span minutes and hit several
    // consecutive samples; see the round-robin note below)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.localSession(cpus, benchConfs)
    // Warm-up pass at the smallest scale factor: whole-stage codegen
    // compilation (Janino) is single-threaded and dominated the first
    // execution of each query (observed 10-100x wall-clock inflation at
    // ~95% idle CPU). One tiny-SF pass compiles every query's generated
    // code so the timed passes below measure data-plane work.
    // SPARK_GRAFT_ONLY=q132_prefix_join,q87_ann_recall_audit — restrict
    // to a comma-separated subset for perf iteration (full run otherwise)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // VERDICT r06 item 7: time BOTH dense-id assignment forms (SURVEY §2
    // P5) at bench scale so runScalable's 100 TB claim carries a
    // measured number, not just GoldenParitySpec's byte-equality. Bench-
    // only entries (x_ prefix — no oracle surface): same sort contract
    // as etl.Clean on the biggest bench table (lineitem, 600k @ sf0.1).
    val idCols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    def idBase(s: SparkSession, d: String): DataFrame =
      Tables.load(s, d, "lineitem").select(idCols.head, idCols.tail: _*)
    val extraEntries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "x_dense_id_window" -> ((s: SparkSession, d: String) =>
        idBase(s, d).withColumn("id", row_number().over(
          // window-scale: twinned — the bench baseline being measured
          // AGAINST x_dense_id_scalable (ops/GlobalIndex)
          Window.orderBy(col("l_orderkey"), col("l_linenumber"))).cast("long"))),
      "x_dense_id_scalable" -> ((s: SparkSession, d: String) =>
        graft.ops.GlobalIndex.withDenseIndex(idBase(s, d), "id",
          Seq(col("l_orderkey"), col("l_linenumber")))))
    // (q39's scaled-planes twin graduated from bench-only
    // x_ann_multiprobe_scaled to catalog q205_ann_scaled_planes in r10 —
    // it is timed through SparkEntry.queries like every catalog entry.)
    val entries = (SparkEntry.queries.toSeq ++ extraEntries)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // The timed action. NOT count(): Aggregate(count(1)) lets Catalyst
    // prune every computed column, so a narrow query (q14's text stats,
    // the dense-id window twin) collapses to a bare scan-count and the
    // bench under-measures it — verified on the optimized plan (the
    // Project under the count is EMPTY). The noop sink materializes
    // every output column on the executors without collecting or
    // writing — the standard full-computation benchmark action.
    // (`exhaust` is an object member so BenchOne times the SAME action
    // — the benchConfs lesson applied to the timed action itself.)
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      entries.foreach { case (_, fn) =>
        try exhaust(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
    }
    // Build every frame once at sfDir BEFORE timing: queries that
    // materialize a fixture on first use (q201's partitioned orders,
    // q202's drift batches — memoized per sfDir) must pay that one-time
    // write here, not inside rep 1's timed sample (with REPS<=2 the
    // median cannot reject it).
    entries.foreach { case (_, fn) =>
      try fn(spark, sfDir) catch { case _: Throwable => () }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Reps are INTERLEAVED round-robin (all queries rep 1, then all
    // rep 2, …), not consecutive per query: this host stalls in
    // multi-minute windows (~95% idle CPU), and consecutive reps let one
    // window poison every sample of whichever query it lands on
    // (observed: a 0.7 s query reporting a 15 s median). With rounds
    // minutes apart, per-query medians reject a bad window. The min is
    // reported alongside as the interference-free steady-state floor.
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector())
    // A query that errors yields a near-zero fail-fast sample that would
    // silently flatter the suite total (round-5 lesson: 5 analysis-dead
    // queries hid inside an rc:0 n:190 artifact). Record the first error
    // per query, drop errored queries from the totals, and publish the
    // list so the artifact self-describes partial runs.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Per-rep CALIBRATION anchor: a fixed CPU-bound job (hash-sum over
    // a generated range — no I/O, no shuffle) timed at the start of
    // every rep round. Recorded medians differ up to ~2× between HOST
    // BOOTS on unchanged code (r07: the post-reboot full run inflated
    // ~40-100% on untouched queries while optimized ones still showed
    // their order-of-magnitude drops); the calib series makes that
    // drift a measured number in the artifact itself, so cross-boot
    // comparisons can normalize by the calib ratio instead of arguing
    // from vibes. One warm-up calibration is run (and discarded) before
    // the reps so rep 1's sample doesn't pay codegen compilation.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      // % bounds the addends so the 100M-term sum stays far from the
      // long range (ANSI overflow would kill the anchor)
      Bench.exhaust(spark.range(0L, 400000000L, 1L, cpus.toInt)
        .select(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("id")) % 1000000L).as("h")))
      (System.nanoTime() - t0) / 1e9
    }
    // SECOND anchor, workload-matched to the token/hash family: md5
    // over per-row GENERATED STRINGS (UTF8String allocation + digest —
    // the docs queries' inner loop), same partitioning. One anchor
    // cannot capture ANISOTROPIC host drift: this boot (r07) ran the
    // arithmetic anchor 2.5× FASTER while token-explode+md5 queries ran
    // 2-3× SLOWER (SMT/topology change, not load — reproduced on an
    // idle host). When the two anchors' cross-boot ratios disagree,
    // normalization is ill-defined and bench_diff warns instead of
    // producing absurd rescaled numbers; within-boot A/B (BenchOne,
    // same harness, read the min) remains the only decision procedure.
    def calibrate2(): Double = {
      val t0 = System.nanoTime()
      Bench.exhaust(spark.range(0L, 8000000L, 1L, cpus.toInt)
        .select(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.md5(
              org.apache.spark.sql.functions.concat(
                org.apache.spark.sql.functions.lit("calib:"),
                org.apache.spark.sql.functions.col("id").cast("string")))))
          .as("h")))
      (System.nanoTime() - t0) / 1e9
    }
    // THIRD anchor (r11, VERDICT r10 item 1): a WORKLOAD-SHAPED job —
    // md5-keyed string generation, a 100k-key hash-aggregate exchange,
    // and a join back, all at full parallelism through the same noop
    // sink the timed queries use. The r10 boot pair proved the first
    // two anchors ANTI-correlate with the 32-way catalog (same-HEAD
    // boots read 115.0 vs 145.4 s raw while arith/md5 moved 0.59x/0.45x
    // the OTHER way), because neither exercises a shuffle exchange or
    // concurrent aggregation. This one does; it is FROZEN code (never
    // derived from catalog queries, whose edits would silently move the
    // anchor), synthetic (no I/O — page-cache state is a separate,
    // smaller drift axis), and sized ~1-2 s. bench_diff's default gate
    // is per-query median self-normalization with this anchor as the
    // cross-check for suite-wide code shifts (see tools/bench_diff.py).
    def calibrate3(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      val base = spark.range(0L, 3000000L, 1L, cpus.toInt)
        .select(col("id"),
          md5(concat(lit("anchor:"), (col("id") % 100000L).cast("string")))
            .as("k"))
      val agg = base.groupBy("k")
        .agg(count(lit(1)).as("c"), sum("id").as("s"))
      Bench.exhaust(base.join(agg, "k")
        .select(sum(col("id") + col("c") + (col("s") % 1000L)).as("t")))
      (System.nanoTime() - t0) / 1e9
    }
    calibrate(); calibrate2(); calibrate3()
    val calibs = scala.collection.mutable.ArrayBuffer[Double]()
    val calibs2 = scala.collection.mutable.ArrayBuffer[Double]()
    val calibs3 = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) {
      calibs += calibrate()
      calibs2 += calibrate2()
      calibs3 += calibrate3()
      for ((name, fn) <- entries) {
        val t0 = System.nanoTime()
        try { exhaust(fn(spark, sfDir)) } catch { case e: Throwable =>
          errors.getOrElseUpdate(name,
            (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage))
              .replaceAll("""[^ -!#-\[\]-~]""", " ").take(160))
        }
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
        // queries cache intermediate frames per invocation; drop them so
        // every rep pays the same (full) cost and memory stays bounded.
        // (r12: recorded BEFORE cleanup — the sample is the query, not
        // the harness's bookkeeping.)
        spark.catalog.clearCache()
        // ... and RDD-LEVEL storage too: catalog.clearCache() drops only
        // SQL-cache entries, but GlobalIndex's sorted-pass persist
        // (q192/q163/q111, the x_ dense-id twins) and the CC fixpoint's
        // localCheckpoints are raw RDD blocks that the ContextCleaner
        // releases only after a JVM GC notices the frames are garbage —
        // on a 128 GiB heap that can lag many queries behind, so storage
        // blocks ACCUMULATED across the suite and squeezed every
        // cache-using query that followed (the r10/r11 suite-pressure
        // variance mechanism, seen from the producer side). Nothing
        // re-reads a finished query's RDDs, so eager unpersist is safe.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    val ok = entries.filterNot { case (name, _) => errors.contains(name) }
    val med = ok.map { case (name, _) => name -> median(samples(name)) }
    val mins = ok.map { case (name, _) => name -> samples(name).min }
    val errJson = errors
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    def renderMap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = med.map(_._2).sum
    val totalMin = mins.map(_._2).sum
    val calibMed = median(calibs.toSeq)
    val calibJson = calibs.map(c => f"$c%.4f").mkString("[", ",", "]")
    val calib2Med = median(calibs2.toSeq)
    val calib2Json = calibs2.map(c => f"$c%.4f").mkString("[", ",", "]")
    val calib3Med = median(calibs3.toSeq)
    val calib3Json = calibs3.map(c => f"$c%.4f").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
        s""""n_ok":${ok.size},"n_errored":${errors.size},"errors":$errJson,""" +
        s""""calib_sec":$calibMed,"calib_series":$calibJson,""" +
        s""""calib2_sec":$calib2Med,"calib2_series":$calib2Json,""" +
        s""""calib3_sec":$calib3Med,"calib3_series":$calib3Json,""" +
        s""""queries":${renderMap(med)},""" +
        s""""total_min":$totalMin,"queries_min":${renderMap(mins)},"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try {
      val w = new java.io.PrintWriter(out, "UTF-8")
      try w.println(line) finally w.close()
    } catch { case _: Throwable => () }
    // The driver tail-captures stdout, and rounds 1-3 all recorded
    // "parsed": null — the full per-query maps (86 entries × 2) overflow
    // its capture window, truncating the line mid-key. The FINAL stdout
    // line is therefore a compact summary (totals + the 10 slowest
    // queries only, ~500 bytes); the complete maps live in the
    // BENCH_LOCAL.json file written above.
    val top10 = med.sortBy(-_._2).take(10)
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${entries.size},""" +
        s""""n_ok":${ok.size},"n_errored":${errors.size},""" +
        s""""reps":$reps,"total_min":$totalMin,""" +
        s""""queries":${renderMap(top10)},"sf":"$sfDir"}"""
    println(compact)
    spark.stop()
  }
}
