package graft

/** Fine-interleaved same-boot reads of one catalog query across several
  * CORPUS DIRS — the cross-decade slope analogue of BenchAB's conf-arm
  * A/B (VERDICT r12 item 6: the §8.10 slope method wants both ends of
  * each decade step read in one boot so host drift cannot masquerade as
  * scaling). One JVM, one session: dirs alternate per rep round, the
  * per-dir MIN is the slope number, medians are printed for context.
  *
  * Usage: runMain graft.BenchDirs <query> <dirA,dirB[,...]> [reps]
  */
object BenchDirs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dirs = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.localSession(cpus, Bench.benchConfs)
    val fn = SparkEntry.queries(name)
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // one untimed pass on the SMALLEST dir only: codegen compilation is
    // per-query, not per-dir, and warming every dir would double the
    // heavy decades' wall for no measurement benefit
    Bench.exhaust(fn(spark, dirs.head))
    cleanup()
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector())
    for (i <- 1 to reps; dir <- dirs) {
      val t0 = System.nanoTime()
      Bench.exhaust(fn(spark, dir))
      val sec = (System.nanoTime() - t0) / 1e9
      samples(dir) = samples(dir) :+ sec
      System.err.println(f"[bench-dirs] $name $dir rep $i: $sec%.2f s")
      cleanup()
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val parts = dirs.map { dir =>
      val xs = samples(dir)
      val series = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
      s""""$dir":{"min":${f"${xs.min}%.3f"},"median":${f"${median(xs)}%.3f"},"series":$series}"""
    }
    println(s"""{"query":"$name","reps":$reps,"dirs":{${parts.mkString(",")}}}""")
    spark.stop()
  }
}
