package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

/** Parquet table loaders for the driver test data (TESTDATA.md).
  *
  * Scale notes: parquet scans are columnar + predicate-pushdown-capable;
  * every query below relies on Catalyst pruning the scan to the columns
  * it actually uses (verify via `.explain` → ReadSchema / PushedFilters).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` loader with the TIMESTAMP(NANOS) normalization: sessions
    * read the ns column as long (`spark.sql.legacy.parquet.nanosAsLong`)
    * and we rebuild µs timestamps so Spark and the DuckDB oracle see
    * identical instants (the driver data is µs-aligned; `div 1000` is
    * lossless).
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }

  /** Exact-arithmetic bridge for cross-engine (Spark vs DuckDB oracle)
    * double aggregation: floating sums are order-dependent, so both
    * engines route money-like doubles through DECIMAL(18,6) (exact,
    * associative) and convert to double only at the very end. The test
    * data carries ≤2 decimal places, so the 6-decimal cast is lossless.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))
}
