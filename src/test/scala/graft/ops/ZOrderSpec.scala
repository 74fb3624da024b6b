package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("spread/zValue interleave bits exactly (reference values)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (1L, 1L), (0xFFL, 0x0FL))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    val expected = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (1L, 1L), (0xFFL, 0x0FL))
      .map { case (x, y) => morton(x, y) }
    assert(rows.toSeq == expected)
  }

  test("bucket16 is order-preserving and spans [0, 65535]") {
    import spark.implicits._
    val df = (0L to 1000L).toDF("v")
    val b = df.select(ZOrder.bucket16(col("v"), lit(0L), lit(1000L)).as("b"))
      .collect().map(_.getLong(0))
    assert(b.head == 0L && b.last == 65470L) // floor(1000*65536/1001)
    assert(b.sameElements(b.sorted))
    assert(b.forall(x => x >= 0 && x <= 65535))
  }

  test("z-ordered files have tight min-max ranges on BOTH columns") {
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    ZOrder.write(li, "l_partkey", "l_suppkey", s"$base/z", nFiles = 8)

    // avg fraction of the global value range each FILE spans, per column
    def coverage(path: String, c: String): Double = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name()).agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .collect()
      val glo = li.agg(min(col(c)), max(col(c))).head
      val span = (glo.getLong(1) - glo.getLong(0)).toDouble
      stats.map(r => (r.getLong(2) - r.getLong(1)) / span).sum / stats.length
    }
    val covX = coverage(s"$base/z", "l_partkey")
    val covY = coverage(s"$base/z", "l_suppkey")
    // 8 Morton segments → each file covers a fraction of both dimensions;
    // a plain sort on one column leaves the other near 1.0
    assert(covX < 0.7, s"l_partkey per-file coverage too wide: $covX")
    assert(covY < 0.7, s"l_suppkey per-file coverage too wide: $covY")

    // baseline: sorting by x alone leaves y unclustered (near-full span)
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.parquet(s"$base/sorted_x")
    val baseY = coverage(s"$base/sorted_x", "l_suppkey")
    assert(baseY > 0.9, s"baseline unexpectedly clustered: $baseY")
    assert(covY < baseY, "z-order must beat single-column sort on the second column")
  }

  test("spread3/zValue3 interleave three 16-bit ids exactly (reference values)") {
    import spark.implicits._
    val cases = Seq((0L, 0L, 0L), (65535L, 0L, 0L), (0L, 65535L, 0L),
      (0L, 0L, 65535L), (1L, 1L, 1L), (0xABCL, 0x123L, 0xF0FL))
    val got = cases.toDF("x", "y", "z")
      .select(ZOrder.zValue3(col("x"), col("y"), col("z")).as("m"))
      .collect().map(_.getLong(0))
    def morton3(x: Long, y: Long, z: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1) << (3 * i)) |
        (((y >> i) & 1) << (3 * i + 1)) | (((z >> i) & 1) << (3 * i + 2))).sum
    assert(got.toSeq == cases.map { case (x, y, z) => morton3(x, y, z) })
  }

  test("3-column z-ordered files have tight min-max ranges on ALL THREE columns") {
    val base = java.nio.file.Files.createTempDirectory("zorder3").toString
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    ZOrder.write3(li, "l_partkey", "l_suppkey", "l_orderkey", s"$base/z3", nFiles = 8)
    def coverage(path: String, c: String): Double = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name()).agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .collect()
      val glo = li.agg(min(col(c)), max(col(c))).head
      val span = (glo.getLong(1) - glo.getLong(0)).toDouble
      stats.map(r => (r.getLong(2) - r.getLong(1)) / span).sum / stats.length
    }
    // three dimensions share the 48-bit key's locality budget, so the
    // per-dimension bound is looser than the 2-col case's 0.7 — but
    // every dimension must stay clearly below the ~1.0 a single-column
    // sort leaves the non-sort columns at
    for (c <- Seq("l_partkey", "l_suppkey", "l_orderkey")) {
      val cov = coverage(s"$base/z3", c)
      assert(cov < 0.85, s"$c per-file coverage too wide for 3-col z-order: $cov")
    }
    val got = spark.read.parquet(s"$base/z3")
    assert(got.count() == li.count())
    assert(got.except(li).isEmpty && li.except(got).isEmpty)
  }

  test("withZ3 on an EMPTY frame returns empty instead of a spurious guard error") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L)).toDF("x", "y", "z").filter(col("x") < 0)
    assert(ZOrder.withZ3(df, "x", "y", "z").count() == 0)
  }

  test("withZ keeps null-coordinate rows with a null key (the contract Hilbert.withH mirrors)") {
    import spark.implicits._
    val df = Seq((1L, Option(10L), Option(20L)), (2L, Option.empty[Long], Option(5L)),
      (3L, Option(7L), Option.empty[Long])).toDF("id", "x", "y")
    val byId = ZOrder.withZ(df, "x", "y").collect().map(r => r.getLong(0) -> r).toMap
    assert(byId.size == 3, "withZ must preserve row count under null coords")
    assert(!byId(1L).isNullAt(byId(1L).fieldIndex("z")))
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("z")))
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("z")))
  }

  test("withZ fails loudly when a column range exceeds the exact bound") {
    import spark.implicits._
    // a hash-valued key: range >> 2^37 — bucket16 would silently wrap
    val df = Seq((0L, 1L), (1L << 45, 2L)).toDF("x", "y")
    val e = intercept[Throwable] {
      ZOrder.withZ(df, "x", "y").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(e).contains("exceeds 2^37"),
      s"expected the range-guard error, got: ${messages(e).take(500)}")
  }

  test("withZ guard fires even for keys spanning the full signed-long range") {
    import spark.implicits._
    // raw xxhash64-style values: max-min overflows a LONG subtraction, so a
    // long-space guard would ANSI-throw (or wrap negative and silently pass
    // with ansi=false) — the guard must catch this via double-space compare
    val df = Seq((Long.MinValue, 1L), (Long.MaxValue, 2L)).toDF("x", "y")
    val e = intercept[Throwable] {
      ZOrder.withZ(df, "x", "y").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(e).contains("exceeds 2^37"),
      s"expected the range-guard error, got: ${messages(e).take(500)}")
  }

  test("withZ stays exact (and silent) at the documented bound") {
    import spark.implicits._
    val df = Seq((0L, 0L), ((1L << 37) - 1, 5L)).toDF("x", "y")
    assert(ZOrder.withZ(df, "x", "y").count() == 2)
  }

  test("withZ on an EMPTY frame returns empty instead of a spurious guard error") {
    import spark.implicits._
    // all-NULL bounds row: the range guard must let it pass (no rows to
    // key), not raise "range exceeds" from the NULL comparison
    val df = Seq((1L, 2L)).toDF("x", "y").filter(col("x") < 0)
    assert(ZOrder.withZ(df, "x", "y").count() == 0)
  }

  test("z-ordered write preserves content exactly") {
    val base = java.nio.file.Files.createTempDirectory("zorder_c").toString
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    ZOrder.write(li, "l_partkey", "l_suppkey", s"$base/z", nFiles = 4)
    val got = spark.read.parquet(s"$base/z")
    assert(got.count() == li.count())
    assert(got.except(li).isEmpty && li.except(got).isEmpty)
    assert(got.columns.sorted.sameElements(li.columns.sorted))
  }
}
