ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "setupharvestactionspark"
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
  // This host shows random 10-300s single-core stalls from C2 compile
  // storms over Spark's generated code (measured: full bench swings
  // 44s↔350s). Capping JIT at C1 makes runs deterministic (~72s) at a
  // small steady-state cost. Local-box workaround only — a real cluster
  // keeps full tiered compilation. Override via SPARK_GRAFT_JVM_OPTS
  // (later -XX flags win).
  "-XX:TieredStopAtLevel=1",
  // C1-only mode defaults ReservedCodeCacheSize to 48 MB; ~90 queries of
  // Spark whole-stage codegen overflow it mid-bench ("compilation
  // disabled" in the JVM log), silently degrading every later query to
  // the interpreter — measured as multi-second drift on alphabetically
  // late queries. Size it so the full suite's nmethods fit.
  "-XX:ReservedCodeCacheSize=512m",
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
