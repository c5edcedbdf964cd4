ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fhcrcoetlscalablespark"
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
// as the metric JSON; sbt's "[success] Total time: …" epilogue would
// otherwise print after it and break the parse (BENCH_r10 recorded
// parsed:null for exactly this reason).
showSuccess := false
// …and the forked run's stdout must bypass sbt's logger entirely:
// LoggedOutput re-emits every child line with an "[info] " prefix,
// which broke the driver's JSON parse for 11 straight rounds even
// after the line became last (BENCH_r11). StdoutOutput pipes the
// child's stdout straight through, unprefixed.
run / outputStrategy := Some(StdoutOutput)
// showSuccess is consumed by sbt's own command layer, which the
// lintUnused check can't see.
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
  // 32 local executor threads + persisted pipeline spines need headroom;
  // 8g forces full-GC thrash once the later bench queries run (observed
  // 3-15x slowdowns for whichever queries run last), and at 32g the
  // Gantt ranked-stops cache still gets evicted under a full bench
  // (bimodal 2s/5s draws). Box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
