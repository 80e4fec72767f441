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
// The bench/verify mains print machine-parseable one-line JSON contracts
// on stdout. sbt's default LoggedOutput wraps every forked-process line
// in "[info] " and appends its own "[success] Total time ..." line, which
// defeats any consumer that json-parses the process's final stdout line
// (BENCH_r15..r18 all have parsed:null for exactly this reason).
// StdoutOutput passes the forked JVM's stdout/stderr through verbatim,
// and showSuccess drops the trailing [success] banner, so the bench's
// one-line JSON is the true final line of the sbt process's stdout.
outputStrategy := Some(StdoutOutput)
showSuccess := false
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
  // Pin the heap and pre-touch it: G1 UNCOMMITS regions after a full GC
  // (Bench runs System.gc() between queries, so the heap shrinks after
  // every query) and RE-COMMITTING those pages on this shared host
  // intermittently costs ~50x the normal CPU — kernel page-commit storms
  // that land on whichever allocation-heavy stage (DOM/DTM parses above
  // all) next grows the heap. That is the "wandering stall" the bench
  // kept recording (x01 19s in r8, x03/x04 pass-2 spikes in r15-r18):
  // reproduced OUTSIDE Spark with a 30-line JAXP storm (identical work
  // 2.6 vs 142 process-CPU-s across rounds, flat GC/JIT) and eliminated
  // by Xms=Xmx + AlwaysPreTouch (25/25 rounds flat) — see BASELINE.md
  // round-18 "page-commit storms" section. Costs one ~3-8 s pre-touch
  // at JVM start (untimed) and holds the full heap RSS for the JVM's
  // life — the right trade for a benchmarking/test JVM on a 128 GiB box.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
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
