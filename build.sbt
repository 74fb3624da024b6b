ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "projectmarketpulseetlpipelinewithllmintegrationspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output goes straight to stdout, not through sbt's logger —
// the driver machine-parses Bench's JSON line and the `info]` prefix
// the logger adds broke that in round 1 ("parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// …and round 2 was STILL "parsed": null — sbt's "[success] Total time"
// epilogue printed after Bench's JSON, and the driver parses the LAST
// line of stdout. Suppress the epilogue so the JSON line is final.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // read by the command engine, not a task
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] = 32 executor threads in ONE driver JVM. Measured on the
  // sf0.1 bench: 8g GC-thrashes under parallel pressure, and >16g
  // degrades 2-3x (compressed-oops shift / G1 region sizing — q17 warm
  // reps: 4.3s @4g, 4.4s @16g, 8-12s @31g, 12-26s @48g). 16g is the
  // sweet spot: headroom without the big-heap penalties.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
