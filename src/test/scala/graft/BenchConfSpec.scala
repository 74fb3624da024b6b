package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench session's codegen-cache fix (VERDICT r06 item 5): the
  * round-5 suite-size inflation (30-80% on unchanged plans) was the
  * generated-class cache thrashing between the warm-up and timed
  * passes. [[Bench.benchConfs]] is applied verbatim by `Bench.main`; if
  * the entry disappears or shrinks below the 200-query working set,
  * this fails in-round instead of as a bench-diff mystery next round.
  */
class BenchConfSpec extends AnyFunSuite {

  test("bench session pins a codegen cache sized for the full suite") {
    val v = Bench.benchConfs.toMap.get("spark.sql.codegen.cache.maxEntries")
    assert(v.isDefined, "codegen cache conf dropped from Bench.benchConfs")
    assert(v.get.toInt >= 10000,
      s"codegen cache ${v.get} entries — below the 200-query working set")
  }

  test("the bench action evaluates every output column; count() provably does not") {
    // The r07 lesson made mechanical: count() lets Catalyst prune all
    // computed columns (a narrow query times as a bare scan-count), so
    // Bench times the noop sink instead. A raise_error column makes the
    // difference BEHAVIORAL: pruned → no error; evaluated → error. If
    // someone swaps the bench action back to count(), the second assert
    // here is the spec that explains why that under-measures.
    import org.apache.spark.sql.functions.expr
    val spark = TestSpark.spark
    val trap = spark.range(1).select(expr("raise_error('evaluated')").as("x"))
    assert(trap.count() == 1L, "count() should prune x and succeed")
    intercept[Throwable] {
      trap.write.format("noop").mode("overwrite").save()
    }
  }
}
