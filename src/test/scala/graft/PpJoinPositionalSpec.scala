package graft

import org.scalatest.funsuite.AnyFunSuite

/** The PPJoin positional filter (r12) prunes prefix-collision rows in
  * q132/q136 whose colliding ranks make the overlap threshold
  * unreachable. The filter is claimed LOSSLESS (a qualifying pair's
  * first-collision row always survives — TextOps rationale at q132);
  * this pins the claim executably: the `on` arm must return exactly the
  * `off` (r11 prefix-only) arm's rows, the default must structurally BE
  * the on arm, and a mistyped arm must fail loud (the A/B-conf lessons
  * from ADVICE r11).
  */
class PpJoinPositionalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val conf = "spark.graft.ppjoin.positional"
  private val queries = Seq("q132_prefix_join", "q136_containment_join")

  private def rows(name: String, arm: Option[String]): Seq[String] = {
    arm match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
    try SparkEntry.queries(name)(spark, dir).collect()
      .map(_.toString).toSeq.sorted
    finally {
      spark.conf.unset(conf)
      spark.catalog.clearCache() // both queries cache the shingle frame
    }
  }

  for (name <- queries) {
    test(s"$name: positional on == off row set") {
      val on = rows(name, Some("on"))
      val off = rows(name, Some("off"))
      assert(on.nonEmpty, s"$name returned no pairs at sf0.001 — vacuous")
      assert(on == off,
        s"$name: positional filter dropped or invented pairs (on=${on.size}, off=${off.size})")
    }
  }

  test("default arm is positional-on: the q136 join carries the rank bound") {
    // the off arm's q136 join has no least() anywhere (its length filter
    // is pure multiplication); the positional bound introduces one — so
    // presence of least() in the optimized plan pins the default
    // structurally, the way Q194StorageVariantSpec pins its no-cache
    // default (a silent flip to "off" cannot pass this)
    spark.conf.unset(conf)
    spark.catalog.clearCache()
    val plan = SparkEntry.queries("q136_containment_join")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("least("),
      "default q136 plan lost the positional rank bound — default must be on")
    spark.conf.set(conf, "off")
    try {
      spark.catalog.clearCache()
      val off = SparkEntry.queries("q136_containment_join")(spark, dir)
        .queryExecution.optimizedPlan.toString
      assert(!off.contains("least("),
        "off arm unexpectedly contains least() — the structural pin above is unsound")
    } finally { spark.conf.unset(conf); spark.catalog.clearCache() }
  }

  test("an unrecognized arm fails loud, not as a silent default") {
    spark.conf.set(conf, "On")
    try {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("q132_prefix_join")(spark, dir)
      }
      assert(e.getMessage.contains(conf))
    } finally spark.conf.unset(conf)
  }
}
