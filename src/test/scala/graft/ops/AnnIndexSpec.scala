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

  test("scaledPlaneCount is the integer ceil-log form, exact at the thresholds") {
    // smallest p >= min with 125·2^p >= n — matches ceil(log2(n/125))
    // clamped below at min, WITHOUT floating log (a float log2 can land
    // on either side of an exact power of two; the DuckDB oracle replays
    // the same integer thresholds, so both engines must agree exactly).
    assert(AnnIndex.scaledPlaneCount(1L, 4, 125L) == 4)
    assert(AnnIndex.scaledPlaneCount(500L, 4, 125L) == 4)   // sf0.01
    assert(AnnIndex.scaledPlaneCount(2000L, 4, 125L) == 4)  // 125·2^4 exactly
    assert(AnnIndex.scaledPlaneCount(2001L, 4, 125L) == 5)
    assert(AnnIndex.scaledPlaneCount(5000L, 4, 125L) == 6)  // sf0.1
    assert(AnnIndex.scaledPlaneCount(50000L, 4, 125L) == 9) // sf1
    // cross-check against the mathematical definition over a dense range
    for (n <- 1L to 70000L by 7L) {
      val ref = math.max(4,
        math.ceil(math.log(n.toDouble / 125.0) / math.log(2.0)).toInt)
      val got = AnnIndex.scaledPlaneCount(n, 4, 125L)
      // allow the float form to be off by the known last-bit hazard only
      // AT exact powers of two; elsewhere they must agree
      assert(got == ref || (125L << (got min ref)) * 2 == (125L << (got max ref)),
        s"n=$n got=$got ref=$ref")
    }
  }

  test("planeCountSql replays scaledPlaneCount bit-for-bit in Spark SQL") {
    // The CASE chain is engine-neutral SQL; evaluate it in Spark against
    // the Scala function across the threshold neighborhood.
    val sqlExpr = AnnIndex.planeCountSql("n", 4, 16, 125L)
    val ns = Seq(1L, 124L, 125L, 126L, 500L, 1999L, 2000L, 2001L, 4000L,
      4001L, 5000L, 50000L, 63999L, 64000L, 64001L, 8192000L, 8192001L)
    import spark.implicits._
    val got = ns.toDF("n").selectExpr(s"$sqlExpr AS p")
      .collect().map(_.getInt(0)).toSeq
    val want = ns.map(n => math.min(16, AnnIndex.scaledPlaneCount(n, 4, 125L)))
    assert(got == want, s"sql=$got scala=$want")
  }
}
