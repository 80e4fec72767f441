package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: listener-measured source-read multipliers for the dedup
  * family (records read / table rows). Run ad hoc while tuning plan
  * shapes; the pinned numbers live in OpsSpec/PlanShapeSpec. */
object ScanCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("scan-count").getOrCreate()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scancount").toString
    val rnd = new scala.util.Random(7)
    val docs = (1L to 400L).flatMap { i =>
      val words = Seq.fill(40)(s"w${i}_${rnd.nextInt(60)}").mkString(" ")
      Seq((i, words), (i + 5000L, words + " tail extra"))
    }.toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    val nRows = onDisk.count().toDouble

    val recs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          recs.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    })
    def measure(name: String)(f: => DataFrame): Unit = {
      spark.catalog.clearCache()
      recs.set(0)
      val n = f.count()
      val bus = spark.sparkContext.getClass
        .getMethod("listenerBus").invoke(spark.sparkContext)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      println(f"[scan] $name%-28s rows=$n%-6d reads=${recs.get()}%-8d x=${recs.get() / nRows}%.2f")
    }

    import graft.ops.Dedup
    measure("d02 default")(Dedup.minhashNearDupPairs(onDisk, "doc_id", "text", 0.5))
    measure("d02 zero-residue")(Dedup.minhashNearDupPairs(onDisk, "doc_id", "text", 0.5, materialize = false))
    measure("d02 materialized")(Dedup.minhashNearDupPairs(onDisk, "doc_id", "text", 0.5, materialize = true))
    measure("nearDupDedup minid")(
      Dedup.nearDupDedup(onDisk, "doc_id", "text", 0.5))
    measure("d18 elect default")(
      Dedup.nearDupDedupBy(onDisk, "doc_id", "text",
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), " ")), 0.5))
    measure("d04 simhash default")(
      Dedup.simhashNearDupPairs(onDisk, "doc_id", "text", maxDistance = 7))
    measure("d13 default")(Dedup.winnowNearDupPairs(onDisk, "doc_id", "text", 0.6))
    measure("d13 materialized")(Dedup.winnowNearDupPairs(onDisk, "doc_id", "text", 0.6, materialize = true))
    val prior = onDisk.filter(col("doc_id") <= 5000L)
    val batch = onDisk.filter(col("doc_id") > 5000L)
    measure("d12 default")(Dedup.dedupAgainst(batch, prior, "doc_id", "text", 0.5))
    measure("d12 materialized")(Dedup.dedupAgainst(batch, prior, "doc_id", "text", 0.5, materialize = true))
    // production signature-table path: prior text scanned once (verify)
    val sigDir = java.nio.file.Files.createTempDirectory("scansig").toString
    Dedup.signatures(prior, "doc_id", "text").write.mode("overwrite").parquet(sigDir)
    val sigs = spark.read.parquet(sigDir)
    measure("d12 via signatures")(
      Dedup.dedupAgainstSignatures(batch, sigs, prior, "doc_id", "text", 0.5))
    spark.stop()
  }
}
