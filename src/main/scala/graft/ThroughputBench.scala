package graft

import org.apache.spark.sql.functions._

/** MARC mapping micro-benchmark — the analog of the reference's
  * index_bench (benchmark-ips of map_record over a cycled corpus,
  * /root/reference/index_bench/index_bench.rb): replicate the 30-record
  * fixture corpus N times and push it through the complete demo pipeline,
  * reporting records/second.
  *
  * Usage: `sbt "runMain graft.ThroughputBench [copies] [cpus]"`
  * (default 10000 copies = 300k records, 16 cpus).
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10000)
    val cpus = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = GraftSession.builder("graft-throughput", s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.marc.MarcFunctions.marcRecordEncoder

    val fixture = "src/test/resources/fixtures/test_data.utf8.json"
    val base = graft.marc.MarcSource.readJson(spark, fixture).collect().toSeq
    val total = base.size.toLong * copies
    val recs = spark.createDataset(base).crossJoin(spark.range(copies))
      .select(struct(col("leader"), col("fields")).as("record"))
    recs.cache().count() // isolate mapping cost from input generation

    // warmup pass first (JIT), like the reference's benchmark-ips warmup
    // phase (/root/reference/index_bench/index_bench.rb) — steady-state
    // throughput is the comparable number
    graft.examples.DemoIndexer.index(recs).write.mode("overwrite").format("noop").save()

    val t0 = System.nanoTime()
    graft.examples.DemoIndexer.index(recs).write.mode("overwrite").format("noop").save()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"marc_throughput","records":$total,"seconds":$secs%.1f,"records_per_sec":${total / secs}%.0f,"cpus":$cpus}""")
    spark.stop()
  }
}
