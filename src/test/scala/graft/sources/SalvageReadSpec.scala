package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The damaged-lake recovery contract ([[Formats.readParquetSalvage]]):
  * corrupt files are skipped, vanished files are skipped, good rows
  * survive — and the DEFAULT read stays strict so data loss is always
  * an explicit call-site decision.
  */
class SalvageReadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString

  /** One part file of (id, v) rows appended to `dir`. */
  private def writeGood(dir: String, ids: Range): Unit =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)

  private def schema = new org.apache.spark.sql.types.StructType()
    .add("id", "long").add("v", "string")

  test("salvage read skips a corrupt file and keeps every good row") {
    val dir = freshDir("salvage_corrupt")
    writeGood(dir, 0 until 100)
    writeGood(dir, 100 until 200)
    // a truncated upload: valid magic, garbage body, no footer
    Files.write(Paths.get(dir, "part-corrupt.parquet"),
      ("PAR1" + "x" * 512).getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)

    val salvaged = Formats.readParquetSalvage(spark, dir, schema)
    assert(salvaged.count() == 200)
    assert(salvaged.agg(sum(col("id"))).head().getLong(0) == (0L until 200L).sum)

    // the strict default must refuse the same directory
    val strict = spark.read.schema(schema).parquet(dir)
    intercept[Throwable] { strict.count() }
  }

  test("salvage read skips a file deleted between planning and execution") {
    val dir = freshDir("salvage_missing")
    writeGood(dir, 0 until 100)
    writeGood(dir, 100 until 200)

    val salvaged = Formats.readParquetSalvage(spark, dir, schema)
    val strict = spark.read.schema(schema).parquet(dir)
    // both frames have now LISTED the directory (planning); delete one
    // data file before execution — the compactor-vs-reader race
    val victim = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet")).sorted.head
    Files.delete(Paths.get(victim))

    val n = salvaged.count()
    assert(n == 100, s"expected the surviving file's 100 rows, got $n")
    intercept[Throwable] { strict.count() }
  }
}
