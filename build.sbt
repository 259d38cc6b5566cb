ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "llmpretrainingdatapipelinespark"
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
// The bench/verify drivers parse the LAST stdout line as JSON; sbt's
// trailing "[success] Total time" banner would otherwise follow our
// final JSON line inside the driver's tail-capture window, and sbt's
// logger would decorate every forked-stdout line with an "[info] "
// prefix that breaks a strict JSON parse of that line.
Global / showSuccess := false
run / outputStrategy := Some(StdoutOutput)
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
// Heap stays at 8g: full-run bench timings show random 3-30x
// per-query outliers under EVERY heap size tried (8g twice, 32g with
// matching -Xms measured WORSE: 126/139/182 s totals on identical
// code) — the noise is host-level, not GC-by-heap-pressure, so a
// bigger heap only slows allocation-heavy cells. Perf conclusions come
// from isolated SPARK_GRAFT_BENCH_ONLY min-of-N runs, never full-run
// deltas (SCALING.md "Measurement discipline").
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
