package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout helpers: pre-shuffle a table ONCE at write time so
  * every subsequent equi-join/aggregation on the bucket key runs with no
  * exchange at all.
  *
  * At 100 TB the repeated fact-fact join (orders ⋈ lineitem on orderkey)
  * is the dominant shuffle; bucketing both sides by the join key with the
  * same bucket count moves that shuffle from query time to ingest time.
  * Catalyst recognizes matching bucket specs and plans a SortMergeJoin
  * whose children read co-located buckets directly (verified by
  * BucketingSpec: zero Exchange operators in the joined plan).
  *
  * Bucket count sizing: target ≤ ~128 MB of post-compression data per
  * bucket per partition-of-the-largest-consumer; too few buckets caps
  * parallelism, too many makes small files.
  */
object Bucketing {

  /** Write `df` as a bucketed external table (bucketed + sorted by the
    * key so bucket-local merge joins skip the sort too).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — exchange-free
    * when bucket specs match.
    */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
