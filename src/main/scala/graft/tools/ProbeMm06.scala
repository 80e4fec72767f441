package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic for the mm06 collapse regression — times each
  * piece of the collapsed simhash banding path on the mm06 corpus.
  * Delete after the investigation. */
object ProbeMm06 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("probe-mm06", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[mm06probe] $label%-40s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    val docs = graft.Tables.documents(spark, d).select(col("doc_id"),
      to_binary(col("text"), lit("utf-8")).as("payload"))
    val sigs = docs.select(col("doc_id").as("id"),
      graft.functions.BinarySimhashExpression.binarySimhash64(col("payload"), 4).as("sig"))
    val maxDistance = 7
    for (pass <- 1 to 2) {
      System.err.println(s"--- pass $pass ---")
      val groups = time("groups agg + eager ckpt") {
        sigs.groupBy(col("sig"))
          .agg(sort_array(collect_list(col("id"))).as("ids"))
          .withColumn("gkey", element_at(col("ids"), 1))
          .localCheckpoint(true)
      }
      val n = time("groups count")(groups.count())
      val buckets = groups.select(col("gkey"), col("sig"),
        posexplode(array(graft.ops.Dedup.simhashChunkCols(col("sig"), maxDistance): _*)).as(Seq("ci", "cv")))
        .repartition(col("ci"), col("cv"))
      val joined = buckets.alias("a").join(buckets.alias("b"),
          col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.gkey") < col("b.gkey"))
        .select(col("a.gkey").as("ga"), col("b.gkey").as("gb"),
          col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      val nJoined = time("raw join count")(joined.count())
      val deduped = joined.dropDuplicates("ga", "gb")
      val nDedup = time("dedup count")(deduped.count())
      val gpairs = deduped
        .withColumn("distance", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .filter(col("distance") <= maxDistance)
        .select(col("ga"), col("gb"), col("distance"))
      val nG = time("gpairs count")(gpairs.count())
      val full = time("full simhashPairsFromSigs noop") {
        graft.ops.Dedup.simhashPairsFromSigs(sigs, maxDistance)
          .write.mode("overwrite").format("noop").save()
      }
      System.err.println(s"[mm06probe] n_groups=$n raw_join=$nJoined dedup=$nDedup gpairs=$nG")
      org.apache.spark.sql.graftbridge.CheckpointBridge.unpersist(groups)
    }
    spark.stop()
  }
}
