ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wikihadoopspark"
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
// The driver captures `sbt -batch "runMain graft.Bench" 2>&1 | tail -c 2000`
// and json-parses the LAST line. Three things must hold for that to work:
// (a) the forked JVM's stdout passes through RAW — sbt's default logger
//     re-logs it with an "[info] " prefix, which is not bare JSON;
// (b) sbt must not append "[success] Total time: ..." after the run;
// (c) nothing (Spark WARN spam) may flood the 2000-char window after the
//     metric line (handled by src/main/resources/log4j2.properties).
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
  // Throughput-batch JVM profile, measured on the 32-thread ingest
  // (warm-pass minima, same build): ParallelGC peaks 825-872 MB/s vs
  // G1's 745-772 — the ingest allocates hard on all threads and the
  // throughput collector's young-gen scavenges beat G1's pacing; 16g
  // keeps the full-GC tail (observed at 8g: passes degrading to ~330
  // MB/s once the old gen fills) out of the measurement window.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+UseParallelGC",
) ++ sys.env.get("SPARK_EXTRA_JVM_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
