ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkastreamslogcorrelationspark"
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
// The bench/verify drivers parse the LAST stdout line as JSON. Two sbt
// behaviors have broken that in past rounds: (a) forked `run` output is
// routed through sbt's logger, which prefixes every line with "[info] ";
// (b) sbt prints "[success] Total time ..." AFTER the program's output.
// StdoutOutput passes the forked JVM's stdout through verbatim, and
// showSuccess drops the trailer, so the program's own last line is the
// process's last line.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
) ++
  // opt-in profiling aids for perf investigation (OPTIMIZATION_r14.md):
  // SPARK_GRAFT_EVENTLOG=<dir> records the Spark event log (per-stage
  // task metrics incl. GC time); SPARK_GRAFT_GCLOG=<file> records JVM
  // GC pauses. Both land OFF the stdout contract line.
  sys.env.get("SPARK_GRAFT_EVENTLOG").map(d => Seq(
    "-Dspark.eventLog.enabled=true", s"-Dspark.eventLog.dir=$d")).getOrElse(Seq()) ++
  sys.env.get("SPARK_GRAFT_GCLOG").map(f => Seq(s"-Xlog:gc,safepoint:file=$f")).getOrElse(Seq())
