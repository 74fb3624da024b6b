package graft

import org.scalatest.funsuite.AnyFunSuite

/** q194's storage strategy is conf-switchable (r11: the exchange-reuse
  * default was chosen by same-boot A/B after the query's 2.5x same-code
  * cross-boot swing was traced to cache pressure — ARCHITECTURE §8.5).
  * The switch is only sound if every variant computes the same rows;
  * this pins it at sf0.001 so a future edit to one arm's lineage cannot
  * silently diverge from the others.
  */
class Q194StorageVariantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("cache / lean / none variants return identical rows; default is none") {
    val fn = SparkEntry.queries("q194_mrr_eval")
    def rows(variant: Option[String]): Seq[String] = {
      variant match {
        case Some(v) => spark.conf.set("spark.graft.q194.storage", v)
        case None => spark.conf.unset("spark.graft.q194.storage")
      }
      try fn(spark, dir).collect().map(_.toString).toSeq.sorted
      finally {
        spark.conf.unset("spark.graft.q194.storage")
        spark.catalog.clearCache() // the cache/lean arms persist frames
      }
    }
    val default = rows(None)
    val none = rows(Some("none"))
    val lean = rows(Some("lean"))
    val cache = rows(Some("cache"))
    assert(default.nonEmpty)
    assert(default == none, "default must be the none arm")
    assert(none == lean, "lean arm diverged")
    assert(none == cache, "cache arm diverged")
  }
}
