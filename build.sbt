ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "opentelemetrycollectorcontribspark"
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
// The bench driver tail-parses the LAST stdout line as JSON. Two pieces
// of sbt log decoration defeated that for three rounds: the forked run's
// output was routed through sbt's logger (every line prefixed
// "[info] "), and sbt printed its own "[success] Total time..." as the
// true final line. Send forked-run output straight to stdout and
// suppress the success banner so `graft.Bench`'s compact contract line
// is the bare, final line of `sbt -batch "runMain graft.Bench"`.
run / outputStrategy := Some(StdoutOutput)
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
  // 16g default: the bench's scale-point phase (10× LSH corpus, cached
  // pair list reused by the d11/d35 scale timings) OOMed executor
  // threads at 8g (run 38) — local[32] shares one heap across driver
  // and all 32 executor threads; the host has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
