package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sign-random-projection LSH for approximate nearest-neighbor search —
  * the 100 TB path that replaces the O(n²) brute-force cosine join
  * (graft.queries.SimilarityOps q20).
  *
  * Each vector gets a `nPlanes`-bit signature: bit p is the sign of the
  * dot product with pseudo-random hyperplane p. Vectors sharing a bucket
  * (signature) are candidate neighbors; search becomes an equi-join on
  * the bucket key. For cosine similarity, P(bit differs) = θ/π, so
  * bucket collisions concentrate on small-angle pairs.
  *
  * Determinism (for the DuckDB oracle): hyperplane components are ±1
  * derived from `splitmix64` of (plane, dim) — a pure-integer recurrence
  * both engines evaluate identically — and the projection is a strict
  * sequential fold over dims, so signatures are bit-exact across engines.
  *
  * Scale: signature assignment is a narrow per-row map; the candidate
  * join shuffles on the bucket key only. At 1000 executors the bucket
  * count (2^nPlanes × any band multiplier) bounds per-reducer fan-in;
  * skewed buckets (dense regions) are the AQE-skew / salt-the-bucket
  * case. Multi-probe (flipping low-margin bits) trades recall for cost
  * without re-sharding.
  */
object AnnIndex {

  /** ±1 hyperplane components from a splitmix64-style mix of (plane,dim).
    * Pure integer math — reproducible in any engine with 64-bit ints.
    */
  def planeComponent(plane: Int, dim: Int): Int = {
    var z = plane.toLong * 1000003L + dim.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) 1 else -1
  }

  def planes(nPlanes: Int, dims: Int): Seq[Seq[Int]] =
    (0 until nPlanes).map(p => (0 until dims).map(d => planeComponent(p, d)))

  /** Append a `bucket` column: the nPlanes-bit sign signature of `vecCol`
    * (array<double>). Projection per plane is a strict left fold so the
    * oracle can replay it bit-for-bit.
    */
  def withBucket(df: DataFrame, vecCol: String, nPlanes: Int, dims: Int): DataFrame = {
    val ps = planes(nPlanes, dims)
    val bits: Seq[Column] = ps.zipWithIndex.map { case (w, p) =>
      // proj_p = ((0 ± v[0]) ± v[1]) ± ... — strict fold, fixed order,
      // mirrored exactly (0-based → 1-based) by bucketSql below.
      val proj = w.zipWithIndex.foldLeft("CAST(0 AS DOUBLE)") { case (acc, (s, d)) =>
        val op = if (s > 0) "+" else "-"
        s"(($acc) $op $vecCol[$d])"
      }
      when(expr(proj) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    df.withColumn("bucket", bits.reduce(_ + _))
  }

  /** `nBits`-bit sign signature over planes `fromPlane .. fromPlane+nBits-1`
    * (bit j = plane fromPlane+j) as a Column — the building block behind
    * both the base signature ([[withBucket]] is the fromPlane=0 case) and
    * the capped-refinement extra family ([[withCappedBucket]]), which
    * indexes its planes from a STATIC base so its SQL twin is one
    * corpus-size-independent string.
    */
  def signatureCol(vecCol: String, fromPlane: Int, nBits: Int, dims: Int): Column = {
    val bits: Seq[Column] = (0 until nBits).map { j =>
      val w = (0 until dims).map(d => planeComponent(fromPlane + j, d))
      val proj = w.zipWithIndex.foldLeft("CAST(0 AS DOUBLE)") { case (acc, (s, d)) =>
        val op = if (s > 0) "+" else "-"
        s"(($acc) $op $vecCol[$d])"
      }
      when(expr(proj) > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Capped bucketing — bound the bucket-size tail (VERDICT r13 item 1).
    *
    * [[scaledPlaneCount]] holds EXPECTED occupancy near `targetDepth`,
    * but says nothing about the realized tail: measured max/mean ran
    * 12–18× across five organic decades (tools/slope_r13_occupancy.txt,
    * max 291 vs mean 15.7 at 2M vectors), and bucket-join pair work
    * rides Σc² — i.e. the tail quadratically. A skewed real-world
    * embedding distribution (dense semantic clusters) could concentrate
    * mass in ways the global plane-count formula cannot see.
    *
    * The cap: any base bucket whose count c exceeds `cap` is split by
    * `e = min{e : cap·2^e ≥ c}` EXTRA signature bits (so expected
    * sub-bucket size lands in (cap/2, cap]), taken from a hash family
    * at static plane indices `extraBase .. extraBase+maxExtra-1` —
    * static so the oracle's extra-signature SQL does not depend on the
    * runtime base plane count. The refined key is
    * `base + (xsig mod 2^e) · 2^planes`: unrefined buckets (e=0, the
    * mod-1 branch) keep their base key untouched, and refined keys
    * cannot collide across base buckets (key mod 2^planes = base).
    *
    * Everything is deterministic from counts + vectors, so a DuckDB
    * oracle replays it exactly: GROUP-BY counts, the [[planeCountSql]]
    * CASE chain with (min=0, max=maxExtra, target=cap) for e, and the
    * same static extra family via [[signatureSql]].
    *
    * Scale: one extra hash exchange on the base bucket (the window
    * below) vs the uncapped form — the per-bucket count CANNOT be
    * broadcast at 100 TB (n/targetDepth rows), so it rides a window
    * over the bucket partitioning. Residual honesty: the bound is an
    * EXPECTATION — exact-duplicate vectors share every signature bit
    * and no hyperplane family can separate them; exact-dup mass
    * belongs to the exact-dedup pass (q13/q58) upstream of any
    * similarity bucketing.
    *
    * Output columns: the input's, plus `bucket` (refined key),
    * `base_bucket`, `x_extra` (the per-bucket e), `xsig` (the full
    * maxExtra-bit extra signature, for probe-side reuse).
    */
  def withCappedBucket(df: DataFrame, vecCol: String, planes: Int, dims: Int,
      cap: Long, extraBase: Int, maxExtra: Int): DataFrame = {
    require(planes + maxExtra < 62, s"refined key overflows a long")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("base_bucket")
    withBucket(df, vecCol, planes, dims)
      .withColumnRenamed("bucket", "base_bucket")
      .withColumn("xsig", signatureCol(vecCol, extraBase, maxExtra, dims))
      // materialize the count ONCE: handing the window expression to
      // every CASE branch of extraPlanesCol makes the Window operator
      // carry one aggregate buffer per branch (_we0.._we6 in the plan)
      .withColumn("bucket_c", count(lit(1)).over(w))
      .withColumn("x_extra", extraPlanesCol(col("bucket_c"), cap, maxExtra))
      .drop("bucket_c")
      .withColumn("bucket",
        col("base_bucket") +
          (col("xsig") % expr(s"shiftleft(CAST(1 AS BIGINT), x_extra)")) *
          lit(1L << planes))
  }

  /** Per-bucket extra-plane count as a Column: the smallest e with
    * cap·2^e ≥ c — the [[scaledPlaneCount]] recurrence over a count
    * COLUMN (minPlanes=0), as a when-chain on the identical integer
    * thresholds. Counts past cap·2^maxExtra fail loudly (assert_true
    * raises in the executor) instead of silently under-splitting,
    * mirroring the oracle's error() branch.
    */
  def extraPlanesCol(cCol: Column, cap: Long, maxExtra: Int): Column = {
    val chain = (0 until maxExtra).foldLeft(Option.empty[Column]) {
      case (acc, e) =>
        val branch = cCol <= lit(cap << e)
        Some(acc.fold(when(branch, lit(e)))(_.when(branch, lit(e))))
    }.get
    chain.otherwise(
      when(cCol <= lit(cap << maxExtra), lit(maxExtra))
        .otherwise(expr(
          s"CAST(assert_true(false, 'bucket count exceeds cap<<maxExtra=" +
            s"${cap << maxExtra} — raise maxExtra') AS INT)")))
  }

  /** DuckDB rendering of [[signatureCol]]: bits for planes
    * `fromPlane .. fromPlane+nBits-1`, 1-based element access.
    */
  def signatureSql(vecExpr: String, fromPlane: Int, nBits: Int, dims: Int): String = {
    val bitExprs = (0 until nBits).map { j =>
      val w = (0 until dims).map(d => planeComponent(fromPlane + j, d))
      val proj = w.zipWithIndex.foldLeft("CAST(0 AS DOUBLE)") { case (acc, (s, d)) =>
        val op = if (s > 0) "+" else "-"
        s"(($acc) $op $vecExpr[${d + 1}])"
      }
      s"CASE WHEN ($proj) > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }
    bitExprs.mkString("(", " + ", ")")
  }

  /** Multi-probe expansion: emit the home bucket plus every bucket at
    * Hamming distance 1 (one flipped hyperplane sign) for the PROBE side
    * of an ANN join. Near-boundary vectors — the ones LSH misclassifies —
    * differ from their true neighbors in exactly the low-margin bit, so
    * probing the 1-flip neighborhood recovers most of the lost recall for
    * (nPlanes+1)× candidate cost, without re-sharding the index side.
    */
  def withProbeBuckets(df: DataFrame, nPlanes: Int): DataFrame = {
    val probes = (0 until nPlanes).map(p => expr(s"CAST(${1L << p} AS BIGINT) ^ bucket"))
    df.withColumn("probe_bucket",
      explode(array((col("bucket") +: probes): _*)))
  }

  /** Corpus-sized plane count: the smallest p ≥ `minPlanes` with
    * targetDepth·2^p ≥ n, i.e. ⌈log₂(n/targetDepth)⌉ clamped below by
    * `minPlanes` — expected bucket depth stays ≤ targetDepth as the
    * corpus grows, keeping the bucket-join's pair volume ~linear in n
    * (fixed planes make depth ∝ n and the join O(n²/2^planes)).
    * Pure-integer comparison, NOT a floating log: the DuckDB oracle
    * replays the same thresholds as a CASE chain (`planeCountSql`), and
    * a float log₂ could land on either side of an exact power of two.
    */
  def scaledPlaneCount(n: Long, minPlanes: Int, targetDepth: Long): Int = {
    var p = minPlanes
    while (p < 62 && (targetDepth << p) < n) p += 1
    p
  }

  /** DuckDB rendering of scaledPlaneCount over a BIGINT count expression:
    * a CASE chain on the exact integer thresholds targetDepth·2^p for
    * p in [minPlanes, maxPlanes]. Engine-neutral saturating form: inputs
    * beyond the last threshold get maxPlanes, mirroring the Spark
    * require() only when the caller asserts n fits. Oracle-only SQL
    * should use [[planeCountSqlGuarded]] so an out-of-range corpus fails
    * the DuckDB run as loudly as the Spark side (ADVICE r10) instead of
    * silently testing a smaller plane count.
    */
  def planeCountSql(nExpr: String, minPlanes: Int, maxPlanes: Int,
      targetDepth: Long): String = {
    // min == max degenerates to the constant — a zero-WHEN CASE is a
    // parse error in DuckDB, not a constant
    if (minPlanes >= maxPlanes) return s"($maxPlanes)"
    val whens = (minPlanes until maxPlanes).map { p =>
      s"WHEN ($nExpr) <= ${targetDepth << p} THEN $p"
    }
    s"(CASE ${whens.mkString(" ")} ELSE $maxPlanes END)"
  }

  /** [[planeCountSql]] with the ELSE branch rendered as a DuckDB
    * `error()` guard (the OracleCc pattern): past the last threshold the
    * oracle RAISES instead of saturating, matching the Spark side's
    * require(). DuckDB-only SQL — `error()` is not a Spark function, so
    * the engine-neutral saturating form stays separate for SQL that both
    * engines evaluate.
    */
  def planeCountSqlGuarded(nExpr: String, minPlanes: Int, maxPlanes: Int,
      targetDepth: Long): String = {
    val whens = (minPlanes until maxPlanes).map { p =>
      s"WHEN ($nExpr) <= ${targetDepth << p} THEN $p"
    }
    val guard = s"CAST(error('plane count saturated: n > " +
      s"${targetDepth << maxPlanes} exceeds maxPlanes=$maxPlanes') AS INTEGER)"
    // maxPlanes itself is still a legitimate answer — n in
    // (targetDepth·2^(maxPlanes-1), targetDepth·2^maxPlanes] maps to it;
    // only n PAST the maxPlanes threshold raises
    val top = s"WHEN ($nExpr) <= ${targetDepth << maxPlanes} THEN $maxPlanes"
    s"(CASE ${(whens :+ top).mkString(" ")} ELSE $guard END)"
  }

  /** DuckDB rendering of the signature with a RUNTIME plane count: bit p
    * contributes only when p < `planesExpr` (a scalar column/expression),
    * so one static SQL string serves any corpus size up to 2^maxPlanes
    * buckets. The gate comes first in the conjunction — DuckDB's CASE
    * short-circuits, so disabled planes never evaluate their fold.
    */
  def bucketSqlGated(vecExpr: String, maxPlanes: Int, dims: Int,
      planesExpr: String): String = {
    val ps = planes(maxPlanes, dims)
    val bitExprs = ps.zipWithIndex.map { case (w, p) =>
      val proj = w.zipWithIndex.foldLeft("CAST(0 AS DOUBLE)") { case (acc, (s, d)) =>
        val op = if (s > 0) "+" else "-"
        s"(($acc) $op $vecExpr[${d + 1}])"
      }
      s"CASE WHEN $p < ($planesExpr) AND ($proj) > 0 " +
        s"THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }
    bitExprs.mkString("(", " + ", ")")
  }

  /** DuckDB rendering of the same signature, for oracle SQL generation.
    * `vecExpr` must be a DOUBLE[] expression; element access is 1-based
    * in DuckDB, so dim d becomes [d+1].
    */
  def bucketSql(vecExpr: String, nPlanes: Int, dims: Int): String = {
    val ps = planes(nPlanes, dims)
    val bitExprs = ps.zipWithIndex.map { case (w, p) =>
      val proj = w.zipWithIndex.foldLeft("CAST(0 AS DOUBLE)") { case (acc, (s, d)) =>
        val op = if (s > 0) "+" else "-"
        s"(($acc) $op $vecExpr[${d + 1}])"
      }
      s"CASE WHEN ($proj) > 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }
    bitExprs.mkString("(", " + ", ")")
  }
}
