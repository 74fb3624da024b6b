package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{ByteType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.Column

/** Parquet table loaders for the driver test data (TESTDATA.md).
  *
  * Scale notes: parquet scans are columnar + predicate-pushdown-capable;
  * every query below relies on Catalyst pruning the scan to the columns
  * it actually uses (verify via `.explain` → ReadSchema / PushedFilters).
  */
object Tables {

  /** Flavor-proof timestamp boundary: upstream writers (pandas, arrow,
    * another engine) freely switch parquet timestamps between µs-UTC
    * (`isAdjustedToUTC=true` → Spark `TimestampType`), µs naive
    * (`timestamp[us]` no-tz → Spark `TimestampNTZType`), and
    * `TIMESTAMP(NANOS)` (→ `LongType` under
    * `spark.sql.legacy.parquet.nanosAsLong`). The engine must not care:
    * every load normalizes to `TimestampType`. Graft sessions pin
    * `spark.sql.session.timeZone=UTC` ([[GraftSession.sharedConfs]]), so
    * the NTZ→TZ cast is an exact relabeling of the same wall-clock
    * micros — no instant shifts.
    *
    * The cast is a no-op projection over the scan (column pruning and
    * predicate pushdown still reach the parquet reader), so this costs
    * nothing at 100 TB.
    */
  def normalizeTemporal(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    // ONE projection for all casts (withColumns), not a withColumn per
    // column: chained withColumn stacks a Project node per call, which
    // the analyzer re-resolves on every load of every query
    if (ntz.isEmpty) df
    else df.withColumns(ntz.map(c => c -> col(c).cast(TimestampType)).toMap)
  }

  /** `ts`-column normalizer covering the nanos-as-long flavor on top of
    * [[normalizeTemporal]]'s NTZ handling. LongType can only be detected
    * per-column (a long column is not inherently temporal), so callers
    * that know `ts` is a timestamp route through here; the driver data
    * is µs-aligned, making `div 1000` lossless.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Numeric-flavor boundary — the NTZ lesson's sibling (VERDICT r06
    * item 3): upstream writers freely narrow integers (int64 ↔
    * int32/16/8) and floats (float64 ↔ float32) between fixture
    * regenerations; every load widens narrow ints → long and float →
    * double so queries downstream see ONE numeric flavor regardless of
    * what the writer chose. Top-level columns only: nested/array
    * element types (the embeddings `list<float>`) keep their declared
    * shape — similarity queries consume them through expressions that
    * already promote to double.
    *
    * Like [[normalizeTemporal]], this is a no-op projection over the
    * scan (pruning and pushdown still reach the parquet reader).
    * Oracle contract: DuckDB reads the SAME narrow files un-widened,
    * so any query that passes a widenable column through to its output
    * must pin the type on BOTH sides (`.cast("long")` + `CAST(... AS
    * BIGINT)`) — [[graft.sources.NumericFlavorSpec]] holds the engine
    * side of that contract.
    */
  def widenNumerics(df: DataFrame): DataFrame = {
    val widened = df.schema.fields.collect {
      case f if f.dataType == IntegerType || f.dataType == ShortType ||
        f.dataType == ByteType => f.name -> LongType
      case f if f.dataType == FloatType => f.name -> DoubleType
    }
    // single projection, same reason as [[normalizeTemporal]]
    if (widened.isEmpty) df
    else df.withColumns(widened.map { case (c, t) => c -> col(c).cast(t) }.toMap)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    widenNumerics(normalizeTemporal(spark.read.parquet(s"$dir/$name.parquet")))

  /** `events` loader: [[load]] plus the nanos-as-long `ts` case. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(load(spark, dir, "events"))

  /** Exact-arithmetic bridge for cross-engine (Spark vs DuckDB oracle)
    * double aggregation: floating sums are order-dependent, so both
    * engines route money-like doubles through DECIMAL(18,6) (exact,
    * associative) and convert to double only at the very end. The test
    * data carries ≤2 decimal places, so the 6-decimal cast is lossless.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))
}
