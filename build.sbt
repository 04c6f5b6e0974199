ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "overpaintspark"
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
// Forked run output goes straight to stdout/stderr with NO "[info]" log
// prefix — the driver parses Bench's single JSON line from raw stdout,
// and round 1's BENCH_r01.json recorded parsed:null because every line
// arrived as "[info] {...}".
Compile / run / outputStrategy := Some(StdoutOutput)
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
  // A 322-query bench session JIT-compiles tens of thousands of generated
  // classes (whole-stage codegen emits fresh classes per plan); the JDK 17
  // default 240 MB code cache fills late in the run, the sweeper starts
  // flushing hot methods, and end-of-session reruns degrade 10-15×
  // (round-10 artifact: embedding_corr_dims steady 63.5 s in-session vs
  // 3.8-4.2 s in a fresh JVM). 512 MB keeps the whole session compiled.
  "-XX:ReservedCodeCacheSize=512m",
)
