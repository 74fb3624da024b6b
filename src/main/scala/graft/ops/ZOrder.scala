package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: co-locate rows that are close in TWO
  * dimensions at once, so per-file/per-row-group min-max statistics are
  * tight on BOTH columns and scans filtering on either one (or both)
  * skip most of the table. This is the data-layout tool for the second
  * predicate column — plain sort-by-x gives perfect skipping on x and
  * none on y; the Z-curve trades a little of x's locality for skipping
  * on both. (Same operator as Delta/Iceberg `OPTIMIZE ZORDER BY`.)
  *
  * Built Spark-first from composable pieces — no custom expression
  * needed, every step is codegen'd built-ins:
  *  1. [[bucket16]]: order-PRESERVING range bucketing of each column to
  *     16 bits using its global min/max (two scalars, broadcast). Raw
  *     values can't interleave directly — Morton needs bounded
  *     non-negative ints, and rank-bucketing also absorbs skew.
  *  2. [[zValue]]: interleave the two 16-bit bucket ids into one 32-bit
  *     Morton key with the classic shift-mask spread (5 bitwise stages
  *     per column — pure arithmetic, replayable in any engine).
  *  3. [[write]]: range-partition by the z key (contiguous curve
  *     segments per file), sort within partitions, write parquet.
  *
  * At 100 TB: the min/max pass is one partial-agg scan; the write is
  * one range exchange — the same cost as a plain global sort-write, but
  * the files it leaves behind prune on two predicate columns instead of
  * one.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i
    * (Morton "part1by1", 64-bit magic-mask form).
    */
  def spread(c: Column): Column = {
    val m = Seq(
      (16, 0x0000FFFF0000FFFFL),
      (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL),
      (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    m.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (s, mask)) =>
      (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(mask))
    }
  }

  /** Morton key of two 16-bit bucket ids (x in even bits, y in odd). */
  def zValue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Order-preserving 16-bit range bucket of `c` given its global
    * [minV, maxV]: floor((c - min) * 65536 / (max - min + 1)) — exact
    * integer arithmetic (numerator reduced to an exact multiple before
    * the divide, so no double-rounding), replaying bit-for-bit as
    * integer `//` division in any engine. Constant columns
    * (max == min) all land in bucket 0. Exact for value ranges up to
    * 2^37 (product stays under 2^53).
    */
  def bucket16(c: Column, minV: Column, maxV: Column): Column = {
    val a = (c.cast("long") - minV.cast("long")) * 65536L
    val b = maxV.cast("long") - minV.cast("long") + lit(1L)
    ((a - (a % b)) / b).cast("long")
  }

  /** Largest value range [[bucket16]] is exact for: (c - min) * 65536
    * must stay under 2^53 so the multiple-reduced double division
    * cannot round. Beyond it the buckets would silently wrap to
    * garbage, so [[withZ]] fails loudly instead.
    */
  val MaxRange: Long = 1L << 37

  /** The full per-row z-key for two long/int columns of `df`, computed
    * against the frame's own min/max (one broadcast scalar row).
    * Fails at runtime if either column's range exceeds [[MaxRange]]:
    * hash-valued or wide-range keys would otherwise overflow bucket16
    * silently and produce a useless layout. For such keys, pre-bucket
    * (e.g. pmod(xxhash64(c), 2^16)) before z-ordering.
    *
    * The guard lives on the 1-ROW BOUNDS frame, wrapped around a
    * scalar the key computation needs (so pruning can't drop it), and
    * evaluates once when the broadcast is built — NOT as a CASE WHEN
    * around the per-row z expression. The per-row form costs ~7×: a
    * conditional branch disqualifies its subtree from codegen
    * subexpression elimination, so every duplicated bucket16 subtree
    * inside the spread folds (2^5 copies via the shift-mask stages)
    * gets re-evaluated per row. Found when the r07 bench-action fix
    * first made this query's real cost visible.
    */
  def withZ(df: DataFrame, colX: String, colY: String, as: String = "z"): DataFrame = {
    val bounds = df.agg(
      min(col(colX)).as("minx"), max(col(colX)).as("maxx"),
      min(col(colY)).as("miny"), max(col(colY)).as("maxy"))
    // Compare in double space: max-min as LONG overflows for keys spanning
    // most of the signed-64 range (e.g. raw xxhash64 values) — under ANSI
    // that throws ARITHMETIC_OVERFLOW instead of this guard's message, and
    // with ansi=false it wraps negative and silently passes. Rounding error
    // near 2^63 is ~2^11, orders of magnitude below the 2^37 threshold.
    def inRange(mn: String, mx: String) =
      col(mx).cast("double") - col(mn).cast("double") <= lit(MaxRange.toDouble)
    // empty input: the bounds agg yields one all-NULL row, the inRange
    // conjunction is NULL, and `otherwise(raise_error)` would fire a
    // spurious "range exceeds" on a frame with no rows to key — let the
    // null bounds pass (the cross-joined result is empty regardless)
    val checked = bounds.select(
      when(col("minx").isNull ||
        (inRange("minx", "maxx") && inRange("miny", "maxy")), col("minx"))
        .otherwise(raise_error(concat(
          lit(s"ZOrder.withZ: column range exceeds 2^37 ($colX: ["),
          col("minx").cast("string"), lit(", "), col("maxx").cast("string"),
          lit(s"], $colY: ["),
          col("miny").cast("string"), lit(", "), col("maxy").cast("string"),
          lit("]) — bucket16 would overflow; pre-bucket wide/hash keys first"))))
        .as("minx"),
      col("maxx"), col("miny"), col("maxy"))
    df.crossJoin(broadcast(checked))
      .withColumn(as, zValue(
        bucket16(col(colX), col("minx"), col("maxx")),
        bucket16(col(colY), col("miny"), col("maxy"))))
      .drop("minx", "maxx", "miny", "maxy")
  }

  /** Write `df` z-ordered on (colX, colY) into `nFiles` parquet files:
    * contiguous Morton-curve segments per file, sorted within each so
    * row-group stats are tight too.
    */
  def write(df: DataFrame, colX: String, colY: String, outDir: String, nFiles: Int): Unit =
    withZ(df, colX, colY)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("errorifexists").parquet(outDir)

  // ---- three-column Morton (the real OPTIMIZE ZORDER BY arity) ----

  /** Spread the low 16 bits of `c` so bit i lands at position 3i — the
    * standard 64-bit Morton3D "splitBy3" magic-mask ladder (valid for
    * up to 21 input bits; we feed 16). Same shape as [[spread]], one
    * extra stage because the gaps are twice as wide.
    */
  def spread3(c: Column): Column = {
    val m = Seq(
      (32, 0x001F00000000FFFFL),
      (16, 0x001F0000FF0000FFL),
      (8, 0x100F00F00F00F00FL),
      (4, 0x10C30C30C30C30C3L),
      (2, 0x1249249249249249L))
    m.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (s, mask)) =>
      (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(mask))
    }
  }

  /** 48-bit Morton key of three 16-bit bucket ids (x in bits 3i, y in
    * 3i+1, z in 3i+2).
    */
  def zValue3(x: Column, y: Column, z: Column): Column =
    spread3(x)
      .bitwiseOR(shiftleft(spread3(y), 1))
      .bitwiseOR(shiftleft(spread3(z), 2))

  /** Three-column [[withZ]]: the per-row Morton3D key against the
    * frame's own min/max per column (one broadcast scalar row), with
    * the same hoisted range guard — evaluated once at broadcast build,
    * never on the per-row path.
    */
  def withZ3(df: DataFrame, colX: String, colY: String, colZ: String,
      as: String = "z3"): DataFrame = {
    val bounds = df.agg(
      min(col(colX)).as("minx"), max(col(colX)).as("maxx"),
      min(col(colY)).as("miny"), max(col(colY)).as("maxy"),
      min(col(colZ)).as("minz"), max(col(colZ)).as("maxz"))
    def inRange(mn: String, mx: String) =
      col(mx).cast("double") - col(mn).cast("double") <= lit(MaxRange.toDouble)
    val checked = bounds.select(
      when(col("minx").isNull ||
        (inRange("minx", "maxx") && inRange("miny", "maxy") &&
          inRange("minz", "maxz")), col("minx"))
        .otherwise(raise_error(concat(
          lit(s"ZOrder.withZ3: column range exceeds 2^37 ($colX: ["),
          col("minx").cast("string"), lit(", "), col("maxx").cast("string"),
          lit(s"], $colY: ["),
          col("miny").cast("string"), lit(", "), col("maxy").cast("string"),
          lit(s"], $colZ: ["),
          col("minz").cast("string"), lit(", "), col("maxz").cast("string"),
          lit("]) — bucket16 would overflow; pre-bucket wide/hash keys first"))))
        .as("minx"),
      col("maxx"), col("miny"), col("maxy"), col("minz"), col("maxz"))
    df.crossJoin(broadcast(checked))
      .withColumn(as, zValue3(
        bucket16(col(colX), col("minx"), col("maxx")),
        bucket16(col(colY), col("miny"), col("maxy")),
        bucket16(col(colZ), col("minz"), col("maxz"))))
      .drop("minx", "maxx", "miny", "maxy", "minz", "maxz")
  }

  /** Three-column [[write]]: contiguous Morton3D segments per file. */
  def write3(df: DataFrame, colX: String, colY: String, colZ: String,
      outDir: String, nFiles: Int): Unit =
    withZ3(df, colX, colY, colZ)
      .repartitionByRange(nFiles, col("z3"))
      .sortWithinPartitions(col("z3"))
      .drop("z3")
      .write.mode("errorifexists").parquet(outDir)
}
