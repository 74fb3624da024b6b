package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshDirs(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    (s"$base/in", s"$base/out")
  }

  private def keys(path: String): Set[Long] =
    spark.read.parquet(path).select("l_orderkey")
      .collect().map(_.getLong(0)).toSet

  test("coalesce mode merges small files without losing rows") {
    val (in, out) = freshDirs()
    spark.read.parquet(s"$dir/lineitem.parquet")
      .repartition(64).write.parquet(in) // manufacture the small-files problem
    val stats = Compaction.compact(spark, in, out, targetBytes = 64L * 1024 * 1024)
    assert(stats.filesBefore == 64)
    assert(stats.filesAfter < stats.filesBefore)
    assert(stats.filesAfter == 1) // sf0.001 lineitem ≪ 64 MB
    assert(keys(out) == keys(in)) // content preserved exactly
  }

  test("shuffle mode produces the requested file count from skewed inputs") {
    val (in, out) = freshDirs()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.repartition(32).write.parquet(in)
    val (_, bytes) = Compaction.dirStats(spark, in)
    val target = bytes / 4 + 1 // force ~4 output files
    val stats = Compaction.compact(spark, in, out, targetBytes = target, shuffle = true)
    assert(stats.filesAfter >= 3 && stats.filesAfter <= 5,
      s"expected ~4 files, got ${stats.filesAfter}")
    assert(keys(out) == keys(in))
  }

  test("dirStats sees files inside Hive-partitioned layouts (recursive)") {
    val (in, _) = freshDirs()
    spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").parquet(in)
    val (n, bytes) = Compaction.dirStats(spark, in)
    assert(n > 0, "partitioned data files not found")
    assert(bytes > 0)
  }

  test("no-overwrite contract: compacting onto an existing dir fails") {
    val (in, out) = freshDirs()
    spark.range(10).write.parquet(in)
    spark.range(1).write.parquet(out)
    intercept[Exception] {
      Compaction.compact(spark, in, out)
    }
  }
}
