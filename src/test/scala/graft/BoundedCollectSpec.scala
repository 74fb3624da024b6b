package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BoundedCollectAggregator

/** Unit semantics of the partial-aggregation-safe bounded collect:
  * state never exceeds cap+1 ids, kept groups are exact and complete,
  * over-cap groups finish as null regardless of how partials merged.
  */
class BoundedCollectSpec extends AnyFunSuite {
  private val agg = new BoundedCollectAggregator(3)

  test("groups at or under the cap are collected exactly") {
    val b = Seq(1L, 2L, 3L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b).toSeq == Seq(1L, 2L, 3L))
  }

  test("groups over the cap finish as null, state stays bounded") {
    val b = (1L to 100L).foldLeft(agg.zero)(agg.reduce)
    assert(b.length == 4) // cap + 1, never 100
    assert(agg.finish(b) == null)
  }

  test("merge caps concatenation and preserves over-cap detection") {
    val b1 = Seq(1L, 2L).foldLeft(agg.zero)(agg.reduce)
    val b2 = Seq(3L, 4L).foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(b1, b2)
    assert(m.length == 4 && agg.finish(m) == null)
    // merging an exact pair of small partials keeps the full id set
    val ok = agg.merge(Seq(1L).foldLeft(agg.zero)(agg.reduce),
      Seq(2L, 3L).foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(ok).toSeq == Seq(1L, 2L, 3L))
  }

  test("merge is size-invariant: min(n, cap+1) regardless of merge order") {
    val parts = Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L))
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val leftFold = parts.reduceLeft(agg.merge)
    val rightFold = parts.reduceRight(agg.merge)
    assert(leftFold.length == 4 && rightFold.length == 4)
    assert(agg.finish(leftFold) == null && agg.finish(rightFold) == null)
  }
}
