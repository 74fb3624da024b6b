package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hilbert-curve layout: the locality upgrade over [[ZOrder]]. Both
  * curves co-locate rows that are close in two dimensions, but the
  * Z-curve's diagonal jumps leave some file bounding boxes long and
  * thin; the Hilbert curve only ever steps to an adjacent cell, so
  * contiguous curve segments (= files after a range-partitioned write)
  * have tighter 2-D bounding boxes — fewer files read for box
  * predicates on BOTH columns (measured, not asserted: q192).
  *
  * Spark-first shape: coordinates are range-bucketed to [[Order]] bits
  * (same order-preserving integer bucketing as [[ZOrder.bucket16]]),
  * giving a cell id in a [[Cells]]-cell grid; the cell→curve-position
  * map is a CONSTANT 64 Ki-row table built once on the driver from the
  * classic xy2d bit transform ([[xy2d]]) and broadcast (~1 MB). The
  * per-row work is then one codegen'd projection plus one broadcast
  * hash join — no UDF in the hot path, no shuffle, and the same plan at
  * 100 TB (the lookup is scale-free). The DuckDB oracle replays xy2d
  * as an 8-stage unrolled CTE chain over the same integers, so the key
  * is bit-identical cross-engine (q192's gate proves it).
  *
  * Why not a pure-expression fold like [[ZOrder.spread]]: Morton has a
  * magic-mask closed form; Hilbert's per-bit rotation is data-dependent
  * (each stage reads both coords twice), so the inlined expression tree
  * grows ~3^stages and the lookup join is both smaller codegen and
  * faster. 8-bit coords (65 536 cells) match the file-pruning use case:
  * files per table ≪ 64 Ki, so finer curve resolution cannot change
  * which file a row lands in.
  */
object Hilbert {

  /** Curve order: coordinates are bucketed to this many bits. */
  val Order = 8
  val N: Int = 1 << Order // 256 cells per side
  val Cells: Int = N * N // 65 536

  /** Classic Hilbert xy2d (Wikipedia "Hilbert curve", converting (x,y)
    * to d): MSB-first quadrant walk with reflect+swap rotation. The
    * reflection is across the FULL grid (N−1−v, not s−1−v): later
    * stages mask only lower bits, for which the two differ exactly
    * when v ≥ 2s — the full-grid form is the one that stays correct.
    */
  def xy2d(x0: Int, y0: Int): Int = {
    var x = x0; var y = y0; var d = 0
    var s = N / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = N - 1 - x; y = N - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** The constant cell→position map, `h_cell = (bx << Order) | by` →
    * `h_pos ∈ [0, Cells)`, as a broadcastable frame.
    */
  def lookup(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until Cells)
      .map(c => (c.toLong, xy2d(c >> Order, c & (N - 1)).toLong))
      .toDF("h_cell", "h_pos")
  }

  /** Order-preserving [[Order]]-bit range bucket — [[ZOrder.bucket16]]
    * at 8 bits: exact multiple-reduced integer division, bit-identical
    * to `//` in any engine.
    */
  def bucket8(c: Column, minV: Column, maxV: Column): Column = {
    val a = (c.cast("long") - minV.cast("long")) * lit(N.toLong)
    val b = maxV.cast("long") - minV.cast("long") + lit(1L)
    ((a - (a % b)) / b).cast("long")
  }

  /** Largest value range [[bucket8]] is exact for ((c−min)·256 must
    * stay under 2^53) — wider than [[ZOrder.MaxRange]] because the
    * multiplier is 256, not 65 536.
    */
  val MaxRange: Long = 1L << 45

  /** Per-row Hilbert key for two long/int columns of `df`, against the
    * frame's own min/max (one broadcast scalar row) — [[ZOrder.withZ]]'s
    * contract, including the loud range guard (see there for why the
    * comparison runs in double space).
    */
  def withH(df: DataFrame, colX: String, colY: String, as: String = "h"): DataFrame = {
    val bounds = df.agg(
      min(col(colX)).as("minx"), max(col(colX)).as("maxx"),
      min(col(colY)).as("miny"), max(col(colY)).as("maxy"))
    def inRange(mn: String, mx: String) =
      col(mx).cast("double") - col(mn).cast("double") <= lit(MaxRange.toDouble)
    // guard on the 1-row bounds frame, wrapped around a scalar the key
    // needs — evaluated once at broadcast build, keeping the per-row
    // expression CASE-free so codegen subexpression elimination applies
    // (ZOrder.withZ's r07 lesson; a per-row branch cost ~7× there)
    // empty input: all-NULL bounds row → NULL condition would fire the
    // raise_error spuriously; null bounds pass (result is empty anyway)
    val checked = bounds.select(
      when(col("minx").isNull ||
        (inRange("minx", "maxx") && inRange("miny", "maxy")), col("minx"))
        .otherwise(raise_error(concat(
          lit(s"Hilbert.withH: column range exceeds 2^45 ($colX: ["),
          col("minx").cast("string"), lit(", "), col("maxx").cast("string"),
          lit(s"], $colY: ["),
          col("miny").cast("string"), lit(", "), col("maxy").cast("string"),
          lit("]) — bucket8 would overflow; pre-bucket wide/hash keys first"))))
        .as("minx"),
      col("maxx"), col("miny"), col("maxy"))
    df.crossJoin(broadcast(checked))
      .withColumn("h_cell",
        shiftleft(bucket8(col(colX), col("minx"), col("maxx")), Order)
          .bitwiseOR(bucket8(col(colY), col("miny"), col("maxy"))))
      .drop("minx", "maxx", "miny", "maxy")
      // LEFT join: a NULL in either coordinate makes h_cell NULL, and an
      // inner join would silently drop the row ([[ZOrder.withZ]] keeps
      // null-key rows with a null z — same contract here; write() then
      // preserves row count, null-keyed rows sorting together)
      .join(broadcast(lookup(df.sparkSession)), Seq("h_cell"), "left")
      .withColumn(as, col("h_pos"))
      .drop("h_cell", "h_pos")
  }

  /** Write `df` Hilbert-ordered on (colX, colY) into `nFiles` parquet
    * files: contiguous curve segments per file, sorted within each so
    * row-group stats are tight too ([[ZOrder.write]]'s contract).
    */
  def write(df: DataFrame, colX: String, colY: String, outDir: String, nFiles: Int): Unit =
    withH(df, colX, colY)
      .repartitionByRange(nFiles, col("h"))
      .sortWithinPartitions(col("h"))
      .drop("h")
      .write.mode("errorifexists").parquet(outDir)
}
