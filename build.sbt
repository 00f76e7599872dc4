ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sleeperspark"
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
// The round driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON; sbt's "[success] Total time: ..." epilogue was landing after the
// bench's JSON line and broke that contract (BENCH_r09/r10 "parsed": null).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// ... and the forked run JVM's stdout must pass through RAW (no sbt
// "[info] " prefix), or the JSON line is not valid JSON to the parser.
run / outputStrategy := Some(StdoutOutput)
// The Python-client round-trip spec shells out to pytest, which drives
// the packaged jar through spark-submit — make sure it exists.
Test / test := (Test / test).dependsOn(Compile / packageBin).value
Test / testOnly := (Test / testOnly).dependsOn(Compile / packageBin).evaluated
// Bench's local-cluster section launches graft.ClusterCheck from the
// packaged jar (executor JVMs fetch app classes via spark.jars).
Compile / run := (Compile / run).dependsOn(Compile / packageBin).evaluated
Compile / runMain := (Compile / runMain).dependsOn(Compile / packageBin).evaluated
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
