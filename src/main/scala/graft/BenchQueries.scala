package graft

/** Fine-interleaved same-boot reads of SEVERAL catalog queries on one
  * corpus dir — the cross-QUERY member of the A/B family (BenchAB
  * interleaves conf arms, BenchDirs interleaves corpus dirs). Built for
  * the r14 capped-refinement receipts: q207-vs-q208 and q205-vs-q209
  * are different catalog entries over the same data, so neither
  * existing harness can put both arms inside one boot — and cross-boot
  * comparison is exactly what the bench gate's drift analysis says is
  * unsound for per-query attribution.
  *
  * One JVM, one session: queries alternate per rep round, per-query MIN
  * decides, medians printed for context. Same warm-up discipline as
  * BenchAB (one untimed pass PER QUERY — codegen classes differ across
  * queries, so every arm must compile before any timed sample).
  *
  * Usage: runMain graft.BenchQueries <dir> <q1,q2[,...]> [reps]
  */
object BenchQueries {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.localSession(cpus, Bench.benchConfs)
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    names.foreach { n =>
      Bench.exhaust(SparkEntry.queries(n)(spark, dir))
      cleanup()
    }
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector())
    for (i <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      Bench.exhaust(SparkEntry.queries(n)(spark, dir))
      val sec = (System.nanoTime() - t0) / 1e9
      samples(n) = samples(n) :+ sec
      System.err.println(f"[bench-queries] $n rep $i: $sec%.2f s")
      cleanup()
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val parts = names.map { n =>
      val xs = samples(n)
      val series = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
      s""""$n":{"min":${f"${xs.min}%.3f"},"median":${f"${median(xs)}%.3f"},"series":$series}"""
    }
    println(s"""{"dir":"$dir","reps":$reps,"queries":{${parts.mkString(",")}}}""")
    spark.stop()
  }
}
