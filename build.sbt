ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "recipingdatapipelinespark"
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
// The driver's bench gate keeps a ~2000-char tail of this sbt
// invocation's combined output and parses the LAST JSON line as the
// round summary. sbt's default fork output strategy prefixes every
// forked-stdout line with "[info] " (which defeated the parse in r12,
// VERDICT #1); StdoutOutput passes the forked JVM's stdout/stderr
// through verbatim. showSuccess/showTiming=false drop sbt's trailing
// "[success] Total time: ..." line so graft.Bench's compact summary is
// the literal last line of the invocation (the exit code still carries
// success/failure for the driver's rc check).
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
// showSuccess/showTiming are consumed by sbt's command engine, not by
// another setting — exclude them from the unused-key lint.
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  // local[32] runs driver + all 32 executor threads in this one JVM.
  // A/B'd under the bench gate's environment twice: r5 on the query suite
  // (8g = 106.7s vs 48g = 111.3s — the big heap only defers collection
  // into long late-run mixed GCs), and r6 INCLUDING both medallion passes
  // after the deserialized full-silver caches were removed/serialized
  // (8g = 30.1s vs 16g = 31.3s over q_fact_build + q_dim_upsert +
  // medallion_e2e + medallion_e2e_1m). The r5 medallion_e2e_1m blowup
  // (177s) was those caches, not the heap: with serialized/no caching the
  // small heap is equal-or-faster everywhere and keeps pauses short.
  // Override via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
