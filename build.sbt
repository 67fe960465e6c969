ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "quantumragdatapipelinespark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as the bench record. With the default LoggedOutput strategy sbt
// prefixes every forked-child line with "[info] " and then appends its
// own "[success] Total time: ..." line AFTER the child's final summary,
// so a last-line parse reads sbt noise instead of the JSON
// (BENCH_r{9,10,11}.json all ended parsed:null). StdoutOutput passes the
// child's stdout through raw (no prefix), and showSuccess:=false kills
// the trailing [success] line, leaving Bench's compact summary as the
// literal last stdout line.
Compile / run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
// showSuccess is read by sbt's command engine, not by another setting —
// exclude it from the unused-key lint.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
