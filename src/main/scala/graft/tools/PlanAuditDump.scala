package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Diagnostic for the registry scan/job budget audit (PlanShapeSpec):
  * prints, for every registered query, how many Spark JOBS its
  * construction triggers (model-training collects — each one re-executes
  * everything beneath it) and how many SOURCE SCANS its final plan
  * contains per table path. The audit test's budget tables are derived
  * from this dump; run it again when adding a query to pick its budget
  * honestly. `PLAN_AUDIT_SF` overrides the table dir (default sf0.001). */
object PlanAuditDump {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PLAN_AUDIT_SF", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder(
      appName = "plan-audit", master = "local[8]", shufflePartitions = 8
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      jobs.set(0)
      val t0 = System.nanoTime()
      val df =
        try fn(spark, sf)
        catch { case e: Throwable =>
          println(f"$name%-28s CONSTRUCTION FAILED: $e"); null }
      if (df != null) {
        val plan = df.queryExecution.executedPlan
        // listener events are async; construction collects have already
        // returned, so a short drain is enough for job-START events
        Thread.sleep(150)
        val nJobs = jobs.get()
        val scans = plan.collect {
          case s: FileSourceScanExec =>
            s.relation.location.rootPaths.headOption
              .map(_.getName).getOrElse("?")
          case b: BatchScanExec => b.scan.getClass.getSimpleName
        }
        val byPath = scans.groupBy(identity).view.mapValues(_.size).toMap
          .toSeq.sortBy(_._1).map { case (p, c) => s"$p=$c" }.mkString(",")
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"$name%-28s jobs=$nJobs%-3d scans=[$byPath] (${ms}%.0f ms)")
      }
    }
    spark.stop()
  }
}
