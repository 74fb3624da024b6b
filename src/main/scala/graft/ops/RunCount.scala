package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed RUN-LENGTH counter: for each of several value columns,
  * the number of maximal equal-value runs when the rows are laid out in
  * `(orderCols, value)` order — the quantity a parquet writer's RLE
  * encoder sees, and the core of the q165 encoding advisor.
  *
  * The naive form (explode to long format, one `lag` window partitioned
  * by column name) serializes each column's 100 TB of rows through a
  * single sort partition per column — parallelism = number of audited
  * columns, not cluster size. This operator is the shape the q165
  * scaladoc always promised: range-partition ONCE on the physical order
  * key, count runs per partition in one streaming pass over all columns
  * simultaneously, then stitch partition boundaries with a
  * partition-count-sized merge (one tiny frame, like
  * [[GlobalIndex.withDenseIndex]]'s offsets). Parallelism = number of
  * range partitions; nothing wider than `numPartitions × numColumns`
  * summary rows ever leaves the executors.
  *
  * Semantics (must match the windowed form exactly — pinned by
  * RunCountSpec):
  *  - rows are ordered by `orderCols`; rows TIED on the full order key
  *    are sub-ordered by the value column itself (per column), making
  *    the run count well-defined when the order key is not unique;
  *  - null values compare EQUAL to each other and sort FIRST (Spark's
  *    `asc_nulls_first` / `IS DISTINCT FROM` break semantics).
  *
  * Correct under RangePartitioner because rows equal on the full order
  * key land in the same partition (partitioning is a deterministic
  * function of the key), so a tie group never straddles a boundary and
  * each boundary break depends only on (last value of p, first value of
  * p+1) — exactly what the merge examines.
  *
  * MEMORY CONTRACT: each order-key tie group is buffered in executor
  * heap (its values must be sub-sorted per column), so `orderCols` must
  * be a near-unique physical order key — the operator's domain is
  * storage-order run detection, where the order key IS the (near-
  * unique) file position. A coarse key (e.g. a 3-value flag column)
  * would put O(n) rows in one tie group and defeat the streaming
  * bound; that input is a different question ("runs under an arbitrary
  * grouping"), not a supported use of this operator.
  */
object RunCount {

  private val summarySchema = StructType(Seq(
    StructField("pid", IntegerType, nullable = false),
    StructField("col_name", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_runs", LongType, nullable = false),
    StructField("first_val", StringType, nullable = true),
    StructField("last_val", StringType, nullable = true)))

  /** nulls-first ascending order, matching Spark `asc_nulls_first`. */
  private val nullsFirst: Ordering[String] =
    (a: String, b: String) =>
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else a.compareTo(b)

  /** Per-column run statistics of the STRING columns `valueCols` of
    * `df`, in `(orderCols, value)` order. Returns one row per value
    * column: `(col_name, n_rows, n_runs)`.
    */
  def runStats(df: DataFrame, orderCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema
    val oIdx = orderCols.map(schema.fieldIndex).toArray
    val vIdx = valueCols.map(schema.fieldIndex).toArray
    val names = valueCols.toArray
    val summaries = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      summarizePartition(pid, it, oIdx, vIdx, names)
    }
    val sumDf = spark.createDataFrame(summaries, summarySchema)
    // Boundary stitch: a run CONTINUES across a partition boundary when
    // the last value of partition p equals (null-safely) the first value
    // of p+1 — subtract one run per such boundary. The frame is
    // numPartitions × numColumns rows (metadata-scale); the window below
    // is partitioned per column and never sees data rows.
    val w = Window.partitionBy(col("col_name")).orderBy(col("pid"))
    sumDf
      .withColumn("prev_last", lag(col("last_val"), 1).over(w))
      .withColumn("prev_pid", lag(col("pid"), 1).over(w))
      .withColumn("cont",
        when(col("prev_pid").isNotNull && (col("prev_last") <=> col("first_val")), 1L)
          .otherwise(0L))
      .groupBy(col("col_name"))
      .agg(sum(col("n_rows")).as("n_rows"),
        (sum(col("n_runs")) - sum(col("cont"))).as("n_runs"))
  }

  /** One streaming pass over a range-sorted partition: groups rows tied
    * on the full order key, sorts each tie group's values per column
    * (the per-column tie-break), and counts value breaks. Emits one
    * summary row per NON-EMPTY column stream (empty partitions emit
    * nothing, so the boundary merge only sees real neighbors).
    */
  private def summarizePartition(
      pid: Int, it: Iterator[Row],
      oIdx: Array[Int], vIdx: Array[Int], names: Array[String]): Iterator[Row] = {
    val n = vIdx.length
    val runs = new Array[Long](n)
    val firsts = new Array[String](n)
    val lasts = new Array[String](n)
    val started = new Array[Boolean](n)
    var nRows = 0L
    // current tie group: the order-key values + per-column value buffers
    var groupKey: Array[Any] = null
    val buf = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[String])

    def sameKey(r: Row): Boolean =
      groupKey != null && oIdx.indices.forall { i =>
        val v = r.get(oIdx(i))
        val g = groupKey(i)
        if (g == null) v == null else g == v
      }

    def flushGroup(): Unit = {
      if (groupKey != null) {
        var j = 0
        while (j < n) {
          val vs = buf(j).sorted(nullsFirst)
          vs.foreach { v =>
            if (!started(j)) {
              started(j) = true; firsts(j) = v; lasts(j) = v; runs(j) = 1L
            } else if (!(if (lasts(j) == null) v == null else lasts(j) == v)) {
              runs(j) += 1L; lasts(j) = v
            } else lasts(j) = v
          }
          buf(j).clear()
          j += 1
        }
      }
    }

    it.foreach { r =>
      if (!sameKey(r)) {
        flushGroup()
        groupKey = oIdx.map(r.get(_))
      }
      var j = 0
      while (j < n) { buf(j) += (if (r.isNullAt(vIdx(j))) null else r.getString(vIdx(j))); j += 1 }
      nRows += 1L
    }
    flushGroup()

    if (nRows == 0L) Iterator.empty
    else (0 until n).iterator.map(j =>
      Row(pid, names(j), nRows, runs(j), firsts(j), lasts(j)))
  }
}
