ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbitoolspark"
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
// The driver parses the LAST stdout line of `sbt runMain graft.Bench`
// as JSON; two pieces of sbt noise have broken that parse every round
// ("parsed": null in BENCH_r1-r4): the trailing "[success] Total
// time..." banner, and the "[info] " prefix the logger wraps around
// every forked-process output line. Suppress the banner and send the
// forked JVM's stdout through unwrapped.
Global / showSuccess := false
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / excludeLintKeys += showSuccess
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
  // 16g default: at 167 bench queries in one session the 8g heap aged
  // into full-GC churn that doubled allocation-heavy queries (q162
  // 2.9 s standalone vs 6.7 s late-session); the host has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
