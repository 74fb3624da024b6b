package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame
import graft.TestSpark

/** The numeric-flavor contract (VERDICT r06 item 3) — the
  * [[TimestampFlavorSpec]] lesson applied to numbers: upstream writers
  * legitimately narrow integer ids (int64 ↔ int32/int16) and floats
  * (float64 ↔ float32) between fixture regenerations. The load boundary
  * ([[graft.Tables.widenNumerics]], routed through every
  * [[graft.Tables.load]]) must make all flavors indistinguishable
  * downstream: narrow ints widen to long, float32 to double.
  *
  * Values are chosen float32-exact (dyadic rationals), because the
  * contract under test is TYPE flavor, not float rounding: a writer
  * that actually rounds values to float32 changed the data, which no
  * read boundary can undo.
  */
class NumericFlavorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val baseUs = 1700000000000000L // 2023-11-14T22:13:20Z, µs
  private val rows = Seq(
    (1L, baseUs, 10L, "click", 1.5, "{}"),
    (2L, baseUs + 60L * 1000000, 10L, "view", 2.25, "{}"),
    (3L, baseUs + 45L * 60 * 1000000, 10L, "purchase", 30.0, "{}"),
    (4L, baseUs + 120L * 1000000, 20L, "click", 0.5, "{}"))

  private def writeFlavor(flavor: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"numflavor_$flavor")
    val base = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val df: DataFrame = flavor match {
      case "wide64" => base
      case "narrow32" => base
        .withColumn("event_id", col("event_id").cast(IntegerType))
        .withColumn("user_id", col("user_id").cast(IntegerType))
        .withColumn("value", col("value").cast(FloatType))
      case "narrow16" => base
        .withColumn("event_id", col("event_id").cast(ShortType))
        .withColumn("user_id", col("user_id").cast(ShortType))
        .withColumn("value", col("value").cast(FloatType))
    }
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  private lazy val dirs: Map[String, String] =
    Seq("wide64", "narrow32", "narrow16").map(f => f -> writeFlavor(f)).toMap

  test("written-parquet flavors really differ on disk (the test is not vacuous)") {
    def raw(d: String, c: String): DataType =
      spark.read.parquet(s"$d/events.parquet").schema(c).dataType
    assert(raw(dirs("wide64"), "user_id") == LongType)
    assert(raw(dirs("wide64"), "value") == DoubleType)
    assert(raw(dirs("narrow32"), "user_id") == IntegerType)
    assert(raw(dirs("narrow32"), "value") == FloatType)
    assert(raw(dirs("narrow16"), "user_id") == ShortType)
  }

  test("loadEvents widens every flavor to long/double with identical values") {
    val loaded = dirs.map { case (f, d) => f -> graft.Tables.loadEvents(spark, d) }
    for ((f, df) <- loaded) {
      assert(df.schema("event_id").dataType == LongType, s"flavor $f")
      assert(df.schema("user_id").dataType == LongType, s"flavor $f")
      assert(df.schema("value").dataType == DoubleType, s"flavor $f")
    }
    val vals = loaded.map { case (f, df) =>
      f -> df.select("event_id", "user_id", "value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    }
    val expected = rows.map(r => (r._1, r._3, r._5)).sortBy(_._1)
    for ((f, got) <- vals) assert(got == expected, s"flavor $f values drifted")
  }

  test("dimension-table loads widen narrow keys too (nation-shaped)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("numflavor_dim")
    Seq((0, "ALGERIA", 0), (1, "ARGENTINA", 1), (2, "BRAZIL", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val got = graft.Tables.load(spark, dir.toString, "nation")
    assert(got.schema("n_nationkey").dataType == LongType)
    assert(got.schema("n_regionkey").dataType == LongType)
    assert(got.select(sum("n_nationkey")).head.getLong(0) == 3L)
  }

  test("an aggregating catalog query agrees byte-for-byte across flavors") {
    val results = dirs.map { case (f, d) =>
      f -> graft.SparkEntry.queries("q10_events_hourly")(spark, d)
        .collect().map(_.toString).sorted.toSeq
    }
    val ref = results("wide64")
    assert(ref.nonEmpty)
    for ((f, got) <- results)
      assert(got == ref, s"flavor $f aggregation diverged")
  }
}
