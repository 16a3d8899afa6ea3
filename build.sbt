ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "oraclecassandramigratorspark"
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
// pass the forked run's stdout through unprefixed: the bench/verify
// contract is machine-parsed JSON lines, and sbt's default LoggedOutput
// wraps every line in "[info] " which breaks the driver's parse
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 16g default: the full-catalog single-JVM pass (483 queries, 32
  // local task threads, streaming state stores, sort-heavy write
  // paths) measurably degrades under an 8g heap on the current
  // fixture — GC/spill pressure builds as the pass proceeds and the
  // late alphabetical families (q_stream_*) pay 2-7x their isolated
  // cost (651 s -> 503 s catalog total from the heap bump alone,
  // measured 2026-08-19). Env-overridable for smaller boxes; a real
  // cluster sizes executors separately (guide §5).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Whole-stage codegen emits thousands of generated classes across a
  // full-catalog pass; the JDK default 240m code cache fills late in
  // the pass and the JIT stops compiling (everything after runs
  // interpreted). 512m keeps the compiler on for the whole catalog.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
)
