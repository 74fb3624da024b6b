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

  // The defaults are PER-QUERY, decided by measurement (TextOps
  // rationale at ppjoinPositionalOn): q132 on, q136 off. Pin both
  // structurally, the way Q194StorageVariantSpec pins its no-cache
  // default — a silent default flip cannot pass these.
  test("q136 default arm is positional-OFF: no rank bound, no window cache") {
    // the off arm's q136 join has no least() anywhere (its length
    // filter is pure multiplication); the positional bound introduces
    // one, and its ranked lineage also caches the windowed stream
    spark.conf.unset(conf)
    spark.catalog.clearCache()
    val plan = SparkEntry.queries("q136_containment_join")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("least("),
      "default q136 plan carries the positional rank bound — default must be off")
    spark.conf.set(conf, "on")
    try {
      spark.catalog.clearCache()
      val on = SparkEntry.queries("q136_containment_join")(spark, dir)
        .queryExecution.optimizedPlan.toString
      assert(on.contains("least("),
        "on arm lost the positional bound — the structural pin above is unsound")
    } finally { spark.conf.unset(conf); spark.catalog.clearCache() }
  }

  test("q132 default arm is positional-ON: the join carries the rank bound") {
    // q132's length filter also uses least(), so pin on the BOUND's
    // operands instead: the positional predicate is the only place a
    // least() is applied over the m/r rank attributes
    spark.conf.unset(conf)
    spark.catalog.clearCache()
    val plan = SparkEntry.queries("q132_prefix_join")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("least((m#"),
      "default q132 plan lost the positional rank bound — default must be on")
    spark.conf.set(conf, "off")
    try {
      spark.catalog.clearCache()
      val off = SparkEntry.queries("q132_prefix_join")(spark, dir)
        .queryExecution.optimizedPlan.toString
      assert(!off.contains("least((m#"),
        "off arm unexpectedly carries the rank bound — the structural pin above is unsound")
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
