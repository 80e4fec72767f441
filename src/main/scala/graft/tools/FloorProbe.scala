package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.GraftSession

/** The r19 orchestration-floor profiler (VERDICT item 1): ~136 registered
  * queries run in 0.1-0.5 s at sf0.1 and their aggregate (~53 s) is 84% of
  * the bench total, with a c8/c32 ratio ≈ 1 — i.e. the time is driver-side
  * orchestration, not task compute. This tool splits one execution of a
  * query into the driver phases the stage/task metrics cannot see:
  *
  *   construct — SparkEntry.queries(name)(spark, dir): plan construction +
  *               eager analysis (+ any construction-time actions)
  *   plan      — queryExecution.executedPlan force (optimizer + physical
  *               planning + AQE wrapper creation)
  *   exec      — the noop write, further split (via job listener) into
  *               in-job time vs BETWEEN-job driver gaps (AQE stage
  *               re-planning, codegen, scheduling latency)
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.FloorProbe t19_nfc_normalize,q07_distinct 4"
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("t19_nfc_normalize")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.builder("floor-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // job intervals, driver-clock
    case class Span(start: Long, var end: Long = -1L,
                    var tasks: Int = 0, var taskMs: Long = 0L,
                    var desc: String = "")
    val jobs = mutable.Map.empty[Int, Span]
    val stageJob = mutable.Map.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = Span(System.nanoTime())
          e.stageIds.foreach(sid => stageJob(sid) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = System.nanoTime()) }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          stageJob.get(e.stageId).flatMap(jobs.get).foreach { s =>
            s.tasks += 1
            if (e.taskMetrics != null)
              s.taskMs += e.taskMetrics.executorRunTime
          }
        }
    })

    for (pass <- 1 to passes; name <- names) {
      System.gc()
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val frame = graft.SparkEntry.queries(name)(spark, d)
      val t1 = System.nanoTime()
      frame.queryExecution.executedPlan // force optimize + physical plan
      val t2 = System.nanoTime()
      frame.write.mode("overwrite").format("noop").save()
      val t3 = System.nanoTime()
      // listener events are async — give the bus a moment to drain
      Thread.sleep(150)
      val construction = jobs.synchronized(jobs.values.filter(s => s.end >= 0 && s.end <= t2).toSeq)
      val execJobs = jobs.synchronized(jobs.values.filter(s => s.end > t2).toSeq)
      // merge exec job intervals to compute covered vs gap time in [t2, t3]
      val ivs = execJobs.map(s => (math.max(s.start, t2), math.min(if (s.end < 0) t3 else s.end, t3)))
        .filter(iv => iv._2 > iv._1).sortBy(_._1)
      var covered = 0L; var cursor = t2
      for ((s, e) <- ivs) {
        if (e > cursor) { covered += e - math.max(s, cursor); cursor = math.max(cursor, e) }
      }
      val execNs = t3 - t2
      System.err.println(f"[floor] pass $pass $name%-26s total ${(t3 - t0) / 1e9}%7.3f s = " +
        f"construct ${(t1 - t0) / 1e9}%6.3f (${construction.size}%2d jobs) + " +
        f"plan ${(t2 - t1) / 1e9}%6.3f + " +
        f"exec ${execNs / 1e9}%6.3f (${execJobs.size}%2d jobs, in-job ${covered / 1e9}%6.3f, " +
        f"gaps ${(execNs - covered) / 1e9}%6.3f)")
      if (pass == passes)
        for (s <- execJobs.sortBy(_.start))
          System.err.println(f"[floor]     job ${(s.start - t2) / 1e6}%6.0f→${(s.end - t2) / 1e6}%6.0f ms " +
            f"wall ${(s.end - s.start) / 1e6}%5.0f ms  tasks ${s.tasks}%3d  taskTime ${s.taskMs}%5d ms")
    }
    spark.stop()
  }
}
