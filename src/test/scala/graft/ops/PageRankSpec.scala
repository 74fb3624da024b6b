package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val S = 1000000000000L
  private val Base = (15L * S) / 100L

  private def ranksOf(nodes: Seq[Long], edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    val n = nodes.toDF("node")
    val e = edges.toDF("src", "dst", "w")
    PageRank.ranks(n, e, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("one directed edge: hand-computed fixed-point ranks, 2 iterations") {
    // A(0) -> B(1). iter1: r(A)=base, r(B)=base+0.85*S = S.
    // iter2: contrib to B = r1(A) = base; r(B) = base + (85*base)//100.
    val r = ranksOf(Seq(0L, 1L), Seq((0L, 1L, 1L)), iters = 2)
    assert(r(0L) == Base)
    assert(r(1L) == Base + (85L * Base) / 100L)
  }

  test("symmetric 2-cycle holds the uniform fixed point exactly") {
    // A<->B with equal weights: the uniform start IS the fixed point and
    // fixed-point arithmetic must not drift off it.
    val r = ranksOf(Seq(0L, 1L), Seq((0L, 1L, 3L), (1L, 0L, 3L)), iters = 3)
    assert(r(0L) == S && r(1L) == S)
  }

  test("isolated node keeps exactly the damping base") {
    val r = ranksOf(Seq(0L, 1L, 2L), Seq((0L, 1L, 1L)), iters = 3)
    assert(r(2L) == Base)
  }

  test("rank mass never exceeds the start mass (dangling mass only leaks)") {
    val r = ranksOf(Seq(0L, 1L, 2L, 3L),
      Seq((0L, 1L, 2L), (1L, 2L, 1L), (2L, 0L, 1L), (0L, 3L, 1L)), iters = 3)
    assert(r.values.sum <= 4 * S)
    assert(r.values.forall(_ >= Base))
  }

  test("q99 ranks every nation once, deterministically") {
    val q = graft.SparkEntry.queries("q99_pagerank")
    val a = q(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[Long]("nationkey") -> r.getAs[Long]("rank_scaled")).toMap
    val b = q(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[Long]("nationkey") -> r.getAs[Long]("rank_scaled")).toMap
    assert(a == b)
    assert(a.size == 25 && a.values.forall(_ >= Base))
  }
}
