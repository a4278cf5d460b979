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
  // The "C2 compile storm" stalls this host showed in rounds 1-2 (full
  // bench swinging 44s↔350s, which motivated a TieredStopAtLevel=1 cap)
  // were CODE-CACHE pressure, not C2 itself: ~90 queries of whole-stage
  // codegen overflow the default ReservedCodeCacheSize, the JVM prints
  // "compilation disabled"/flush-recompile loops, and late queries run
  // interpreted (the r2 b12 12s mystery). With the cache sized so the
  // whole suite's nmethods fit, full tiered compilation is both stable
  // (back-to-back totals 59s/69s, no outliers) and ~1.6x faster than
  // the C1 cap (97s). Override via SPARK_GRAFT_JVM_OPTS (later -XX
  // flags win).
  // r10: 512m was sized when the suite was ~90 queries; at 285 the
  // cache fills again and the flush-recompile churn lands on whichever
  // queries run LAST — the e* flagships, alphabetically at the tail
  // (e02's unexplained +50% in the r9 closing bench: code unchanged,
  // isolated probe 1.9 s, in-context 3.5-4.2 s). Reserved size is
  // virtual address space, not RSS — 1g costs nothing on this host.
  // r16: 1g was sized for the ~285-query r10 suite; the 297-query suite
  // plus the optimization round's new codegen shapes showed the late-
  // query inflation signature again (e01 in-context ~2x its isolated
  // wall, no subset reproduces it). Reserved size is virtual address
  // space, not RSS — 2g costs nothing on this host.
  "-XX:ReservedCodeCacheSize=2g",
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
