ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kftaskfhiretlspark"
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
// The driver recovers the bench's one-line JSON record from captured
// stdout; sbt's trailing "[success] Total time: ..." summary line was
// landing AFTER the record and breaking that extraction
// (BENCH_r16..r18 all carry parsed:null). Suppress it so the record
// printed by graft.Bench is the last stdout line.
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
  // the box has ~125 GiB; a roomy heap keeps the string-heavy SMJ
  // cascade out of GC churn (8g measured 2-4x slower under CPU
  // contention), and ParallelGC beats G1 for pure-throughput batch
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
  "-XX:+UseParallelGC",
)
