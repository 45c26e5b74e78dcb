ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ocrspark"
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
// Pass the forked process's stdout straight through instead of routing it
// via sbt's logger: the logger prefixes every line with "[info] ", which
// broke the driver's machine-parse of Bench's single JSON line
// (BENCH_r01.json "parsed": null).
run / outputStrategy := Some(StdoutOutput)
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
  // 24g => 12g young / 12g old with NewRatio=1: the larger eden lets
  // extraction garbage die before each minor GC copies it — measured
  // scaling efficiency at local[32] goes 0.77 -> 0.82 vs a 16g heap
  // (bench, 5-round medians), absolutes +10%.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Throughput GC for the batch-extraction workload: ParallelGC with a
  // large young gen (extraction garbage dies young) scales measurably
  // better than G1 at 32 worker threads (bench: +50% docs/sec at
  // local[32]); same flags a production executor would carry.
  "-XX:+UseParallelGC",
  "-XX:NewRatio=1",
) ++ sys.env.get("SPARK_GRAFT_XMN").map(x => s"-Xmn$x").toSeq
