package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Loss-free interchange: every format round-trips the real test
  * tables bit-exactly (doubles included — shortest-round-trip
  * rendering), adversarial CSV strings survive quoting, corrupt lines
  * quarantine instead of failing the read, and writers refuse to
  * overwrite.
  */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out").toString

  /** Bit-exact frame equality (order-free, nullability-insensitive —
    * file formats legitimately widen in-memory non-null fields).
    */
  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    def shape(df: DataFrame) = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(a) == shape(b), s"schemas differ:\n${a.schema}\n${b.schema}")
    assert(a.count() == b.count())
    val onlyA = a.exceptAll(b).collect().toSeq
    val onlyB = b.exceptAll(a).collect().toSeq
    assert(onlyA.isEmpty && onlyB.isEmpty,
      s"rows only in source: $onlyA\nrows only in round-trip: $onlyB")
  }

  /** Spark disallows plans that reference ONLY `_corrupt_record`
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the
    * parsed frame first, the documented pattern for quarantine flows.
    */
  private def parsed(df: DataFrame): DataFrame = { df.cache(); df.count(); df }

  test("CSV round-trips lineitem (dates, decimals-as-doubles, strings) exactly") {
    val src = spark.read.parquet(s"$dir/lineitem.parquet")
    val path = tmp("csv_lineitem")
    Formats.writeCsv(src, path)
    val back = parsed(Formats.readCsv(spark, path, src.schema))
    assert(back.filter(col("_corrupt_record").isNotNull).isEmpty)
    assertSame(src, back.drop("_corrupt_record"))
  }

  test("ORC round-trips orders exactly") {
    val src = spark.read.parquet(s"$dir/orders.parquet")
    val path = tmp("orc_orders")
    Formats.writeOrc(src, path)
    assertSame(src, Formats.readOrc(spark, path))
  }

  test("JSONL round-trips documents exactly") {
    val src = spark.read.parquet(s"$dir/documents.parquet")
    val path = tmp("jsonl_docs")
    Formats.writeJsonl(src, path)
    val back = parsed(Formats.readJsonl(spark, path, src.schema))
    assert(back.filter(col("_corrupt_record").isNotNull).isEmpty)
    assertSame(src, back.drop("_corrupt_record"))
  }

  test("CSV survives embedded commas, quotes, newlines, and null-vs-empty") {
    import spark.implicits._
    val src = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "line\nbreak"),
      (5L, ""), // empty but NOT null — the F1 filter distinction
      (6L, null.asInstanceOf[String])
    ).toDF("id", "s")
    val path = tmp("csv_adversarial")
    Formats.writeCsv(src, path)
    val back = Formats.readCsv(spark, path, src.schema).drop("_corrupt_record")
    assertSame(src, back)
    // the distinction that motivates the explicit null token:
    val byId = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(5L) == "")
    assert(byId(6L) == null)
  }

  test("the null token itself is CSV's one representable gap — pinned, not hidden") {
    import spark.implicits._
    // A literal string equal to the null token cannot round-trip: CSV
    // has no quoting-level escape for it (the reader null-substitutes
    // after unquoting). This is why the token is chosen OUTSIDE the
    // data domain ("\N" never appears in real text); the pin here makes
    // the limitation loud instead of silently load-bearing.
    val src = Seq((1L, "\\N")).toDF("id", "s")
    val path = tmp("csv_nulltoken")
    Formats.writeCsv(src, path)
    val back = Formats.readCsv(spark, path, src.schema).drop("_corrupt_record")
    assert(back.collect().head.getString(1) == null)
  }

  test("corrupt CSV lines quarantine into _corrupt_record, clean rows survive") {
    val path = tmp("csv_corrupt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "part-0.csv"),
      "id,n\n1,10\nnot-a-long,20\n3,30\n".getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, n BIGINT")
    val back = parsed(Formats.readCsv(spark, path, schema))
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(back.filter(col("_corrupt_record").isNull).count() == 2)
  }

  test("writers refuse to overwrite an existing delivery") {
    import spark.implicits._
    val src = Seq((1L, "x")).toDF("id", "s")
    val path = tmp("csv_noclobber")
    Formats.writeCsv(src, path)
    intercept[Exception](Formats.writeCsv(src, path))
  }
}
