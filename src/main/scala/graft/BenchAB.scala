package graft

/** Fine-interleaved same-boot A/B over one catalog query's conf arms —
  * the decision procedure the bench gate prescribes for cross-boot
  * suspicions (tools/bench_diff.py: per-query attribution is unsound on
  * a drifting boot pair; within-boot A/B, read the min, is sound).
  *
  * Usage: runMain graft.BenchAB <query> <confKey> <armA,armB[,...]> [reps]
  *
  * One JVM, one session: arms alternate per rep round (A B A B ...), so
  * host-load windows hit both arms equally instead of poisoning
  * whichever arm ran second — strictly finer interleaving than r11's
  * paired BenchOne invocations. Prints per-arm series, median, and min
  * (the min is the decision number; medians swing ±3× under host load).
  * Same timed action (Bench.exhaust) and session confs as Bench, same
  * per-rep cache + RDD-storage hygiene.
  */
object BenchAB {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val confKey = args(1)
    val arms = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 3) args(3).toInt else 7
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.localSession(cpus, Bench.benchConfs)
    val fn = SparkEntry.queries(name)
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // one untimed pass per arm: codegen compilation + memoized fixture
    // writes land here, and every arm's generated classes are compiled
    // before ANY timed sample (the warm-up lesson from Bench)
    arms.foreach { arm =>
      spark.conf.set(confKey, arm)
      Bench.exhaust(fn(spark, sfDir))
      cleanup()
    }
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector())
    for (i <- 1 to reps; arm <- arms) {
      spark.conf.set(confKey, arm)
      val t0 = System.nanoTime()
      Bench.exhaust(fn(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      samples(arm) = samples(arm) :+ sec
      System.err.println(f"[bench-ab] $name $confKey=$arm rep $i: $sec%.2f s")
      cleanup()
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val parts = arms.map { arm =>
      val xs = samples(arm)
      val series = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
      s""""$arm":{"min":${f"${xs.min}%.3f"},"median":${f"${median(xs)}%.3f"},"series":$series}"""
    }
    println(s"""{"query":"$name","conf":"$confKey","reps":$reps,"sf":"$sfDir","arms":{${parts.mkString(",")}}}""")
    spark.stop()
  }
}
