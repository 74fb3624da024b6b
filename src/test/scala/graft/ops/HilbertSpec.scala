package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class HilbertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("xy2d is a bijection over the full grid") {
    val ds = (0 until Hilbert.Cells)
      .map(c => Hilbert.xy2d(c >> Hilbert.Order, c & (Hilbert.N - 1)))
    assert(ds.toSet.size == Hilbert.Cells)
    assert(ds.min == 0 && ds.max == Hilbert.Cells - 1)
  }

  test("curve steps to an adjacent cell every time (the locality property)") {
    // invert the map and walk d = 0..Cells-1: each step moves exactly 1
    // in exactly one dimension — the property Morton does NOT have
    val inv = new Array[(Int, Int)](Hilbert.Cells)
    for (x <- 0 until Hilbert.N; y <- 0 until Hilbert.N)
      inv(Hilbert.xy2d(x, y)) = (x, y)
    for (d <- 1 until Hilbert.Cells) {
      val ((x0, y0), (x1, y1)) = (inv(d - 1), inv(d))
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"non-adjacent step at d=$d: ($x0,$y0) -> ($x1,$y1)")
    }
  }

  test("first quadrant walk matches the published curve") {
    // order-1 sub-curve corner values of the standard orientation:
    // (0,0)=0 .. the curve starts by walking the y edge
    assert(Hilbert.xy2d(0, 0) == 0)
    assert(Hilbert.xy2d(Hilbert.N - 1, 0) == Hilbert.Cells - 1)
  }

  test("withH matches the driver-side xy2d on bucketed coords") {
    import spark.implicits._
    // values already in [0, 255] with min 0 / max 255 → buckets are the
    // identity and withH must equal xy2d exactly
    val pts = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (17L, 200L), (128L, 127L))
    val df = (pts ++ Seq((0L, 255L))).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }.toDF("id", "x", "y")
    val got = Hilbert.withH(df, "x", "y").select("x", "y", "h")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for ((x, y) <- pts)
      assert(got((x, y)) == Hilbert.xy2d(x.toInt, y.toInt).toLong,
        s"($x,$y)")
  }

  test("withH keeps null-coordinate rows with a null key (ZOrder.withZ contract)") {
    import spark.implicits._
    val df = Seq((1L, Option(10L), Option(20L)), (2L, Option.empty[Long], Option(5L)),
      (3L, Option(7L), Option.empty[Long])).toDF("id", "x", "y")
    val byId = Hilbert.withH(df, "x", "y").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byId.size == 3, "withH must preserve row count under null coords")
    assert(!byId(1L).isNullAt(byId(1L).fieldIndex("h")))
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("h")))
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("h")))
    // and the write path preserves count too (the ADVICE data-loss hazard)
    val out = java.nio.file.Files.createTempDirectory("hilbert_null").toString
    Hilbert.write(df, "x", "y", s"$out/h", nFiles = 2)
    assert(spark.read.parquet(s"$out/h").count() == 3)
  }

  test("withH fails loudly when a column range exceeds the exact bound") {
    import spark.implicits._
    val df = Seq((0L, 1L), (1L << 50, 2L)).toDF("x", "y")
    val e = intercept[Throwable] { Hilbert.withH(df, "x", "y").collect() }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(e).contains("exceeds 2^45"),
      s"expected the range-guard error, got: ${messages(e).take(500)}")
  }

  test("withH on an EMPTY frame returns empty instead of a spurious guard error") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("x", "y").filter(col("x") < 0)
    assert(Hilbert.withH(df, "x", "y").count() == 0)
  }

  test("hilbert-ordered write preserves content and tightens both columns") {
    val base = java.nio.file.Files.createTempDirectory("hilbert").toString
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    Hilbert.write(li, "l_partkey", "l_suppkey", s"$base/h", nFiles = 8)
    val got = spark.read.parquet(s"$base/h")
    assert(got.count() == li.count())
    assert(got.except(li).isEmpty && li.except(got).isEmpty)

    def coverage(path: String, c: String): Double = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name()).agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .collect()
      val glo = li.agg(min(col(c)), max(col(c))).head
      val span = (glo.getLong(1) - glo.getLong(0)).toDouble
      stats.map(r => (r.getLong(2) - r.getLong(1)) / span).sum / stats.length
    }
    val covX = coverage(s"$base/h", "l_partkey")
    val covY = coverage(s"$base/h", "l_suppkey")
    assert(covX < 0.7, s"l_partkey per-file coverage too wide: $covX")
    assert(covY < 0.7, s"l_suppkey per-file coverage too wide: $covY")
  }
}
