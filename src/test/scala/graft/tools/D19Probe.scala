package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Scratch probe for the d19 bloom-prefilter shuffle pin (not a test). */
object D19Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("d19probe").getOrCreate()
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def words(i: Long) = Seq.fill(25)(s"p${i}_${rnd.nextInt(60)}").mkString(" ")
    val prior = (1L to 2000L).map(i => (i, words(i))).toDF("doc_id", "text")
    val batchRows = (1L to 100L).map(i => (i + 8000L, words(i + 4000L))) ++
      (1L to 100L).map(i => (i + 9000L, words(i)))
    val batch = batchRows.toDF("doc_id", "text")
    val dups = prior.filter(col("doc_id") <= 100L)
      .select((col("doc_id") + 9000L).as("doc_id"), col("text"))
    val fullBatch = batch.filter(col("doc_id") <= 8100L).unionByName(dups)
    val sigs = Dedup.signatures(prior, "doc_id", "text")

    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          perStage.merge(te.stageId,
            te.taskMetrics.shuffleWriteMetrics.recordsWritten, _ + _)
      override def onStageSubmitted(s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        stageNames.put(s.stageInfo.stageId, s.stageInfo.name)
    }
    spark.sparkContext.addSparkListener(listener)
    def run(tag: String)(f: => DataFrame): Unit = {
      perStage.clear(); stageNames.clear()
      val keep = f.select("doc_id").as[Long].collect().toSet
      val bus = spark.sparkContext.getClass
        .getMethod("listenerBus").invoke(spark.sparkContext)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      import scala.jdk.CollectionConverters._
      val total = perStage.values.asScala.sum
      println(s"== $tag keep=${keep.size} totalShuffleRecs=$total")
      perStage.asScala.toSeq.sortBy(_._1).foreach { case (sid, recs) =>
        if (recs > 0)
          println(f"  stage $sid%4d recs=$recs%6d  ${stageNames.getOrDefault(sid, "?").take(120)}")
      }
    }
    run("bloom-off")(Dedup.dedupAgainstSignatures(
      fullBatch, sigs, prior, "doc_id", "text", 0.9, bloomPrefilter = false))
    run("bloom-on")(Dedup.dedupAgainstSignatures(
      fullBatch, sigs, prior, "doc_id", "text", 0.9))
    spark.stop()
  }
}
