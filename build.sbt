ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "monascaaggregatorspark"
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
// Test tiering (the SPARK_GRAFT_TIER idea, applied to the suite):
// SPARK_GRAFT_TEST_TIER=core excludes graft.SlowTest-tagged tests and the
// ScalaCheck PropertySpec (minutes of Spark-backed generative cases; tags
// don't reach the scalacheck framework) so the core suite stays a fast
// pre-commit gate; default (unset) runs everything.
Test / testOptions ++= {
  if (sys.env.get("SPARK_GRAFT_TEST_TIER").contains("core"))
    Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.SlowTest"),
      Tests.Filter(n => n != "graft.PropertySpec"))
  else Seq.empty
}
// The driver captures the LAST ~2000 chars of `sbt runMain` stdout and
// json.loads the bench line. Two sbt default behaviors broke that parse in
// every round 1–12: the forked program's stdout was re-logged with an
// "[info] " prefix, and sbt appended "[success] Total time: ..." AFTER the
// final JSON line. Route forked stdout through unchanged and drop the
// success epilogue so the bench compact line is the true last line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude it
// from the unused-key lint
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
