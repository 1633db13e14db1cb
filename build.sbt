ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ocrpipelinespark"
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
// Forked `runMain` output goes to stdout RAW (no "[info] " logger
// prefix) so the driver's JSON-line parse of graft.Bench works; the
// JSON is additionally written to BENCH_LAST.json as a belt-and-braces
// machine-readable copy.
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
  // Batch-throughput GC for the forked driver JVM: G1's concurrent
  // marking + write barriers measurably stall this allocation-heavy
  // single-JVM bench (measured 2x on the full 65-query run at sf0.1:
  // ~118s -> 60s, every query improved — OPTIMIZATION_r07.md §JVM).
  // Same choice tools/scaling_cluster.sh already applies per family;
  // heap size stays parameterised via SPARK_DRIVER_MEM (8g default
  // measured no worse than 20g here).
  "-XX:+UseParallelGC",
)

// Optimization-round experiment passthrough (OPTIMIZATION_r07.md):
// extra JVM flags for A/B runs without editing the build, e.g.
// GRAFT_JIT_OPTS="-XX:TieredStopAtLevel=1".
javaOptions ++= sys.env.get("GRAFT_JIT_OPTS").toSeq.flatMap(_.split(" ").toSeq)
