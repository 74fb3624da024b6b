package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[MinHash.withBands]] — the per-row, shuffle-free signature form must
  * equal q17's gated explode→groupBy(min) pipeline value-for-value: same
  * permutation family (single source of truth), same distinct-shingle
  * set, so every sig and band is identical.
  */
class MinHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-row signatures equal the gated q17 pipeline on real data") {
    graft.functions.VectorExpressions.register(spark)
    val cols = Seq("n_shingles") ++
      (0 to 7).map(i => s"sig$i") ++ (0 to 3).map(b => s"band$b")
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect() // collect-scale: test assertion, sf0.001 corpus
        .map(r => r.getAs[Long]("doc_id") ->
          cols.map(c => r.getAs[Long](c))).toMap
    val q17 = keyed(graft.SparkEntry.queries("q17_minhash_signatures")(spark, dir))
    val rowForm = keyed(MinHash.withBands(
      graft.Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))))
    assert(rowForm.nonEmpty && rowForm == q17)
  }
}
