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
    // smallest p >= min with depth·2^p >= n — matches ceil(log2(n/depth))
    // clamped below at min, WITHOUT floating log (a float log2 can land
    // on either side of an exact power of two; the DuckDB oracle replays
    // the same integer thresholds, so both engines must agree exactly).
    // The labeled counts are the fixtures' EMBEDDINGS cardinalities
    // (500 / 2000 / 20000) — NOT the documents counts (5000 / 50000);
    // conflating the two is exactly how q205's original depth of 125
    // shipped with the dynamic arm untested (every tested scale landed
    // at or below the 4-plane clamp). At the shipped depth of 25 all
    // three scales exercise the dynamic arm, each on a different count.
    assert(AnnIndex.scaledPlaneCount(1L, 4, 25L) == 4)
    assert(AnnIndex.scaledPlaneCount(400L, 4, 25L) == 4)    // 25·2^4 exactly
    assert(AnnIndex.scaledPlaneCount(401L, 4, 25L) == 5)
    assert(AnnIndex.scaledPlaneCount(500L, 4, 25L) == 5)    // sf0.01 embeddings
    assert(AnnIndex.scaledPlaneCount(2000L, 4, 25L) == 7)   // sf0.1 embeddings
    assert(AnnIndex.scaledPlaneCount(3200L, 4, 25L) == 7)   // 25·2^7 exactly
    assert(AnnIndex.scaledPlaneCount(3201L, 4, 25L) == 8)
    assert(AnnIndex.scaledPlaneCount(20000L, 4, 25L) == 10) // derived-sf1 embeddings
    // cross-check against the mathematical definition over a dense range
    for (n <- 1L to 70000L by 7L) {
      val ref = math.max(4,
        math.ceil(math.log(n.toDouble / 25.0) / math.log(2.0)).toInt)
      val got = AnnIndex.scaledPlaneCount(n, 4, 25L)
      // allow the float form to be off by the known last-bit hazard only
      // AT exact powers of two; elsewhere they must agree
      assert(got == ref || (25L << (got min ref)) * 2 == (25L << (got max ref)),
        s"n=$n got=$got ref=$ref")
    }
  }

  test("planeCountSql replays scaledPlaneCount bit-for-bit in Spark SQL") {
    // The CASE chain is engine-neutral SQL; evaluate it in Spark against
    // the Scala function across the threshold neighborhood.
    val sqlExpr = AnnIndex.planeCountSql("n", 4, 16, 25L)
    val ns = Seq(1L, 24L, 25L, 26L, 400L, 401L, 500L, 2000L, 3200L,
      3201L, 20000L, 51199L, 51200L, 51201L, 1638400L, 1638401L)
    import spark.implicits._
    val got = ns.toDF("n").selectExpr(s"$sqlExpr AS p")
      .collect().map(_.getInt(0)).toSeq
    val want = ns.map(n => math.min(16, AnnIndex.scaledPlaneCount(n, 4, 25L)))
    assert(got == want, s"sql=$got scala=$want")
  }

  test("planeCountSqlGuarded raises past the last threshold instead of saturating") {
    // ADVICE r10: oracle-only SQL must fail as loudly as the Spark
    // require() when the corpus outgrows maxPlanes. DuckDB's error() is
    // not a Spark function, so evaluate the guard behaviorally by
    // substituting Spark's raise_error (same raise-on-branch-taken
    // semantics); the WHEN chain itself is engine-neutral.
    val ducky = AnnIndex.planeCountSqlGuarded("n", 4, 8, 25L)
    assert(ducky.contains("error('plane count saturated"))
    val sparky = ducky.replace("CAST(error(", "CAST(raise_error(")
    import spark.implicits._
    // in-range values (n <= 25·2^8) agree with the Scala function…
    val ns = Seq(1L, 400L, 401L, 3200L, 6400L)
    val got = ns.toDF("n").selectExpr(s"$sparky AS p")
      .collect().map(_.getInt(0)).toSeq
    assert(got == ns.map(n => AnnIndex.scaledPlaneCount(n, 4, 25L)))
    // …and the first out-of-range value raises
    val ex = intercept[Exception] {
      Seq(6401L).toDF("n").selectExpr(s"$sparky AS p").collect()
    }
    assert(ex.getMessage.contains("plane count saturated"))
  }

  test("planeCountSql with min == max is the constant, not an empty CASE") {
    // a zero-WHEN CASE is a parse error in DuckDB; the degenerate form
    // must render as a plain constant
    assert(AnnIndex.planeCountSql("n", 4, 4, 25L) == "(4)")
    import spark.implicits._
    val got = Seq(1L, 1000000L).toDF("n")
      .selectExpr(s"${AnnIndex.planeCountSql("n", 4, 4, 25L)} AS p")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(4, 4))
  }
}
