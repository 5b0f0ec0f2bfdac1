ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stormspark"
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
// The driver parses the bench JSON from the LAST stdout line of
// `sbt "runMain graft.Bench"`. sbt's "[success] Total time: ..." banner
// prints AFTER the forked program exits and displaced the JSON for 7
// straight rounds ("parsed": null in BENCH_r01-r07) — suppress it.
ThisBuild / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — the
// lintUnused warning is a false positive (verified: the banner is gone)
Global / excludeLintKeys += showSuccess
// Forked run output otherwise goes through sbt's logger, which prefixes
// every stdout line with "[info] " (breaking the driver's JSON parse) and
// re-routes the program's STDERR onto sbt's stdout as "[error]" lines —
// where a late-flushing log line can land AFTER the bench JSON. Plain
// passthrough keeps stdout/stderr separate and unprefixed.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // throughput collector: batch jobs trade pause time for ~5-10% less GC
  // overhead vs G1 on a small heap
  "-XX:+UseParallelGC",
)
