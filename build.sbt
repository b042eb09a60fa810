ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tipocastreamspark"
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
// Forked `run` output goes straight through without sbt's "[info] " line
// prefix: graft.Bench prints one bare JSON line on stdout that downstream
// tooling parses, and the prefix would poison that parse.
run / outputStrategy := Some(StdoutOutput)
// …and nothing may print AFTER it: sbt's closing "[success] Total time: …"
// line lands on stdout after the forked JVM exits, so a parser that reads
// the LAST line gets sbt's trailer instead of the JSON (BENCH r3 parsed
// null for exactly this). Suppress the success/timing trailer globally.
Global / showSuccess := false
Global / showTiming := false
// both keys are consumed by sbt's command engine, not a task — lintUnused
// can't see that and would warn on every load
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
)
