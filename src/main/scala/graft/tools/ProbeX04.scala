package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.GraftSession

/** Stage-time profile for one registered query — throwaway diagnostic. */
object ProbeX04 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("x04_sitemap_index")
    val spark = GraftSession.builder("probe-x04", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stageTime = mutable.Map.empty[Int, Long]
    val stageName = mutable.Map.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        stageTime.synchronized {
          stageTime(e.stageId) = stageTime.getOrElse(e.stageId, 0L) +
            e.taskMetrics.executorRunTime
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stageName.synchronized {
          stageName(e.stageInfo.stageId) = e.stageInfo.name.take(120)
        }
    })
    val plan = graft.SparkEntry.queries(name)(spark, d)
      .queryExecution.executedPlan.toString
    System.err.println("[probe] plan fused-batch sites: " +
      "_xpath_fused=".length.min(0) .max(0) +
      ("_xpath_fused".r.findAllIn(plan).size) +
      " single extract_xpath sites: " +
      ("extract_xpath\\(".r.findAllIn(plan).size) +
      " broadcasts: " + ("BroadcastExchange".r.findAllIn(plan).size))
    // warmup then timed
    graft.SparkEntry.queries(name)(spark, d)
      .write.mode("overwrite").format("noop").save()
    stageTime.clear(); stageName.clear()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, d)
      .write.mode("overwrite").format("noop").save()
    System.err.println(f"[probe] wall ${(System.nanoTime() - t0) / 1e9}%.1f s; top stages by executor time:")
    stageTime.toSeq.sortBy(-_._2).take(12).foreach { case (id, ms) =>
      System.err.println(f"[probe]   stage $id%4d ${ms / 1000.0}%8.1f s  ${stageName.getOrElse(id, "?")}")
    }
    spark.stop()
  }
}
