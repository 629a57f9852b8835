ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "deathmetaldatalakespark"
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
// The driver parses Bench's final stdout line as JSON. Without these, sbt
// relays forked output through its logger (an "[info] " prefix on the JSON
// line) and appends "[success] Total time: ..." as the true final line —
// which is why every BENCH_r*.json through r14 shows parsed:null even when
// the line fits the 2 KB tail. StdoutOutput passes the forked process's
// stdout through undecorated; showSuccess drops the trailing banner.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // 24g default (box has 128 GiB): the round-19 driver bench showed the
  // 8g heap degrading monotonically across 442 query executions — pass 2
  // ran 4× slower than pass 1 at LOW host loadavg (q150: 4.8s → 233s,
  // loadavg 1.6 on 32 cores), the signature of a GC-bound JVM, not a
  // host window. Retained SQL-execution state and lazily-collected
  // shuffle/broadcast bookkeeping accumulate until an 8g heap thrashes.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
