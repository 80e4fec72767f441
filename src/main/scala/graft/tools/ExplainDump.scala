package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for registered queries to one file per
  * query — the plan artifacts the optimization rounds commit under
  * `plans/rNN/` so plan-shape claims are checkable without running Spark.
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> [suffix]
  *   - `EXPLAIN_ONLY` (comma-sep names) narrows the set (default: all);
  *   - `EXPLAIN_SF` overrides the table dir (default sf0.01 — big enough
  *     that AQE/broadcast size estimates match the bench's shape class);
  *   - files land as <outDir>/<query><suffix>.txt (suffix e.g. "_before").
  *
  * AQE stays ON (the bench runs with it on); the dump is the INITIAL
  * plan (`isFinalPlan=false`) — join-strategy and exchange placement are
  * visible there, which is what the plan-diff claims reference. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainDump <outDir> [suffix]")
    val outDir = Paths.get(args(0))
    val suffix = if (args.length > 1) args(1) else ""
    Files.createDirectories(outDir)
    val sf = sys.env.getOrElse("EXPLAIN_SF", "/root/testdata/sf0.01")
    val only = sys.env.get("EXPLAIN_ONLY").map(_.split(",").toSet)
    val spark = graft.GraftSession.builder(
      appName = "explain-dump", master = "local[8]", shufflePartitions = 8
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, sf)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"$name$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[explain] wrote $name$suffix.txt (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          println(s"[explain] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
