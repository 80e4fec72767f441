ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "trajectspark"
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
  // local[32] shares one JVM between driver and all 32 executor threads;
  // 8g forced multi-second full-GC pauses into whichever bench query was
  // running (the host has 128 GiB). 24g keeps the old-gen churn off the
  // timed path; SPARK_DRIVER_MEM still overrides for constrained hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // the 111-query bench generates thousands of whole-stage-codegen
  // classes across its 3 passes; at the JDK-17 default 240m the code
  // cache sweeper starts flushing HOT third-party methods (Xerces DOM
  // parsing) long before the "CodeCache is full" warning, and queries
  // late in the run degrade to interpreted speed (x01 19s vs 0.96s
  // isolated, round-8 bench regression). 1g keeps every compiled method
  // resident for the whole run — same remedy long-running codegen-heavy
  // Spark drivers apply in production. (2g is pure reserved-address
  // headroom: the sf1 bench peaks ~200m used — BASELINE.md round-9
  // aged-JVM notes — so the cache is provably not the sf1 limiter.)
  "-XX:ReservedCodeCacheSize=2g",
)
