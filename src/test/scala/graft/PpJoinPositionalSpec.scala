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
  // rationale at ppjoinPositionalOn): q132 on, q136 off. Pin both by
  // PLAN EQUALITY against the explicitly-set arms (ADVICE r12: raw
  // substring pins like "least((m#" are brittle against attribute-id
  // formatting and optimizer rewrites): the default-arm plan must
  // equal one explicit arm's plan and differ from the other's, after
  // normalizing the per-analysis expression ids (#123 → #) that
  // legitimately differ between two builds of the same query.
  private def normalizedPlan(name: String, arm: Option[String]): String = {
    arm match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
    try {
      spark.catalog.clearCache()
      SparkEntry.queries(name)(spark, dir)
        .queryExecution.optimizedPlan.toString
        .replaceAll("#\\d+", "#")
        .replaceAll("plan_id=\\d+", "plan_id=")
        .replaceAll("\\bid = #?\\d+", "id = ")
    } finally { spark.conf.unset(conf); spark.catalog.clearCache() }
  }

  for ((name, defaultArm, otherArm) <- Seq(
      ("q132_prefix_join", "on", "off"),
      ("q136_containment_join", "off", "on"))) {
    test(s"$name default arm is positional-${defaultArm.toUpperCase}: " +
        "default plan == explicit arm's plan") {
      val dflt = normalizedPlan(name, None)
      val same = normalizedPlan(name, Some(defaultArm))
      val other = normalizedPlan(name, Some(otherArm))
      assert(same != other,
        s"$name: the two arms optimized to identical plans — this pin " +
          "can no longer distinguish the default (arms merged?)")
      assert(dflt == same,
        s"$name: default plan != explicit-$defaultArm plan — default flipped")
      assert(dflt != other,
        s"$name: default plan == explicit-$otherArm plan — default flipped")
    }
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
