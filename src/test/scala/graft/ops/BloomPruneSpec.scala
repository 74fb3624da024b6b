package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Bloom semi-join pruning: the contract is "no false negatives" (prune
  * then exact-join ≡ exact join), real pruning on disjoint keys, and a
  * native BloomFilterMightContain probe (no UDF) in the plan.
  */
class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every build key passes the probe") {
    val build = (0 until 1000).map(i => s"key_$i").toDF("k")
    val f = BloomPrune.build(build, col("k"), expectedItems = 1000)
    assert(build.filter(f.mightContain(col("k"))).count() == 1000)
  }

  test("disjoint probe keys are mostly pruned (fpp-bounded survivors)") {
    val build = (0 until 1000).map(i => s"in_$i").toDF("k")
    val probe = (0 until 10000).map(i => s"out_$i").toDF("k")
    val f = BloomPrune.build(build, col("k"), expectedItems = 1000, fpp = 0.01)
    val survivors = probe.filter(f.mightContain(col("k"))).count()
    // 1% fpp over 10k disjoint keys ⇒ ~100 expected; allow generous slack
    assert(survivors < 500, s"bloom pruned almost nothing: $survivors/10000")
  }

  test("prune + exact join equals the unpruned join") {
    val left = (0 until 5000).map(i => (i.toLong, s"k_${i % 700}")).toDF("id", "k")
    val right = (0 until 300).map(i => s"k_${i * 2}").toDF("k")
    val direct = left.join(right, "k").agg(count(lit(1)), sum("id"))
      .collect().head
    val f = BloomPrune.build(right, col("k"), expectedItems = 300)
    val pruned = left.filter(f.mightContain(col("k"))).join(right, "k")
      .agg(count(lit(1)), sum("id")).collect().head
    assert(pruned == direct)
  }

  test("probe is the native expression, not a UDF") {
    val build = Seq("a", "b").toDF("k")
    val f = BloomPrune.build(build, col("k"), expectedItems = 2)
    // a file-backed scan: a local relation would let the optimizer
    // evaluate the probe at plan time and erase it from the plan
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(f.mightContain(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.toLowerCase.contains("udf"), plan)
  }
}
