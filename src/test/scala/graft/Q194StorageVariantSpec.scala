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

  test("cache / lean / none variants return identical rows") {
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
    assert(none == lean, "lean arm diverged")
    assert(none == cache, "cache arm diverged")
  }

  // ADVICE r11: `default == none` above was vacuous (all arms are
  // asserted row-equal, so it could never fail independently). Pin the
  // default STRUCTURALLY instead: with the conf unset, the executed
  // plan must contain no in-memory-cache node — a silent default flip
  // to "cache"/"lean" would materialize InMemoryRelations and fail here.
  test("default arm stores nothing: no InMemoryRelation in the plan") {
    spark.conf.unset("spark.graft.q194.storage")
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q194_mrr_eval")(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("InMemoryRelation"),
      "default q194 arm cached a frame — the A/B-chosen default is none")
  }

  test("an unrecognized storage arm fails loud, not as silent none") {
    spark.conf.set("spark.graft.q194.storage", "Cache")
    try {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("q194_mrr_eval")(spark, dir)
      }
      assert(e.getMessage.contains("spark.graft.q194.storage"))
    } finally spark.conf.unset("spark.graft.q194.storage")
  }
}
