package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[RunCount.runStats]] is the distributed (range-partitioned,
  * mapPartitions-summed) twin of the windowed run counter q165 used
  * pre-r07. The windowed form is replayed here verbatim as the
  * reference semantics; the two must agree exactly — including on ties
  * in the order key, null values, and runs spanning partition
  * boundaries.
  */
class RunCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** The pre-r07 windowed definition (explode + lag window per column),
    * kept as the executable reference semantics.
    */
  private def windowedRunStats(df: DataFrame, orderCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val long = df.select(orderCols.map(col) :+
        array(valueCols.map(n =>
          struct(lit(n).as("col_name"), col(n).as("val"))): _*).as("a"): _*)
      .select(orderCols.map(col) :+ explode(col("a")).as("s"): _*)
      .select(orderCols.map(col) :+ col("s.col_name").as("col_name") :+
        col("s.val").as("val"): _*)
    val w = Window.partitionBy(col("col_name"))
      .orderBy((orderCols.map(col) :+ col("val")): _*)
    long
      .withColumn("brk",
        when(lag(col("val"), 1).over(w).isNull.and(
            row_number().over(w) === 1) ||
          !(lag(col("val"), 1).over(w) <=> col("val")), 1L).otherwise(0L))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"), sum(col("brk")).as("n_runs"))
  }

  private def asMap(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(r.fieldIndex("col_name")) ->
      (r.getLong(r.fieldIndex("n_rows")), r.getLong(r.fieldIndex("n_runs")))).toMap

  test("matches the windowed reference on sf0.001 lineitem") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag").as("rf"),
        col("l_quantity").cast("long").cast("string").as("qty"),
        col("l_suppkey").cast("string").as("sk"))
    val order = Seq("l_orderkey", "l_linenumber")
    val vals = Seq("rf", "qty", "sk")
    val got = asMap(RunCount.runStats(li, order, vals))
    val want = asMap(windowedRunStats(li, order, vals))
    assert(got == want)
  }

  test("runs continue across partition boundaries (boundary stitch)") {
    import spark.implicits._
    // one long constant run: n_runs must be 1 regardless of partitioning
    val df = (1 to 1000).map(i => (i.toLong, "x")).toDF("k", "v")
      .repartition(16) // scramble so repartitionByRange has real work
    val got = asMap(RunCount.runStats(df, Seq("k"), Seq("v")))
    assert(got("v") == (1000L, 1L))
  }

  test("alternating values never merge") {
    import spark.implicits._
    val df = (1 to 999).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("k", "v").repartition(7)
    val got = asMap(RunCount.runStats(df, Seq("k"), Seq("v")))
    assert(got("v") == (999L, 999L))
  }

  test("ties on the order key sub-order by the value (windowed parity)") {
    import spark.implicits._
    // key 1 has values out of order; both forms sort ties by value, so
    // ("a","a","b") is 2 runs, not 3
    val df = Seq((1L, "b"), (1L, "a"), (1L, "a"), (2L, "b"), (3L, "b"))
      .toDF("k", "v").repartition(5)
    val got = asMap(RunCount.runStats(df, Seq("k"), Seq("v")))
    val want = asMap(windowedRunStats(df, Seq("k"), Seq("v")))
    assert(got == want)
    assert(got("v") == (5L, 2L)) // k=1 sorts to a,a,b; then b,b continue → a,a | b,b,b
  }

  test("nulls compare equal and sort first") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, null: String), (3L, "a"),
        (4L, null: String))
      .toDF("k", "v").repartition(3)
    val got = asMap(RunCount.runStats(df, Seq("k"), Seq("v")))
    val want = asMap(windowedRunStats(df, Seq("k"), Seq("v")))
    assert(got == want)
    assert(got("v") == (4L, 3L)) // null,null | a | null
  }

  test("multiple value columns are counted in one pass, independently") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, "const", i.toString))
      .toDF("k", "c", "u").repartition(9)
    val got = asMap(RunCount.runStats(df, Seq("k"), Seq("c", "u")))
    assert(got("c") == (100L, 1L))
    assert(got("u") == (100L, 100L))
  }

  test("empty input yields an empty frame (no summary rows)") {
    import spark.implicits._
    val df = Seq.empty[(Long, String)].toDF("k", "v")
    assert(RunCount.runStats(df, Seq("k"), Seq("v")).count() == 0L)
  }
}
