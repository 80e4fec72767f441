package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology:
  *  - a warmup pass (one cheap query) pays JVM/classloading/codegen startup
  *    so per-query numbers measure the engine, not the first-query tax;
  *  - timing forces FULL materialization through a noop sink —
  *    `df.count()` would let Catalyst prune away every projected column and
  *    benchmark an empty aggregate instead of the actual query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(
        appName = "graft-bench",
        master = s"local[$cpus]",
        shufflePartitions = math.max(cpus.toInt, 8))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: exercise scan + agg + join codegen paths once, untimed
    runOnce("q01_pricing_summary")
    runOnce("q13_scalar_functions")

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> runOnce(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
