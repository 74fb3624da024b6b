package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** ANN quality accounting: bucket balance, and recall of single-bucket
  * vs multi-probe candidate generation against the exact cosine top-1.
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val planes = 4

  private def bucketed() = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    AnnIndex.withBucket(e, "v", planes, 64).select("vec_id", "bucket").cache()
  }

  test("buckets are reasonably balanced (no degenerate hyperplane)") {
    val sizes = bucketed().groupBy("bucket").count().collect().map(_.getLong(1))
    assert(sizes.length > (1 << planes) / 2, s"only ${sizes.length} buckets populated")
    assert(sizes.max < 500 / 2, s"one bucket holds ${sizes.max} of 500 vectors")
  }

  test("multi-probe recovers strictly more exact-top-1 pairs than single bucket") {
    val b = bucketed()
    // ground truth: exact cosine top-1 per vector (from the q20 query)
    val top1 = graft.SparkEntry.queries("q20_cosine_topk")(spark, dir)
      .filter(col("rank") === 1)
      .select(col("vec_id"), col("neighbor_id"))
    val truth = top1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val single = b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q"), col("b.vec_id").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val probes = AnnIndex.withProbeBuckets(b, planes)
    val multi = probes.as("a").join(b.as("b"),
        col("a.probe_bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q"), col("b.vec_id").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recallSingle = truth.count(single.contains).toDouble / truth.size
    val recallMulti = truth.count(multi.contains).toDouble / truth.size
    info(f"recall@top1: single-bucket $recallSingle%.3f, multi-probe $recallMulti%.3f")
    assert(recallMulti > recallSingle)
    assert(recallMulti >= 0.5, f"multi-probe recall too low: $recallMulti%.3f")
  }
}
