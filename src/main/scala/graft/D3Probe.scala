package graft
import org.apache.spark.sql.functions._
import graft.ops.Dedup
object D3Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("probe", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def noJoin = Tables.documents(spark, d)
      .select(col("doc_id"), Dedup.shingleCol(col("text")).as("sh"),
        Dedup.shingleCol(concat(col("text"), lit(" zzz"))).as("sh2"))
      .select(col("doc_id"), round(Dedup.jaccardCol(col("sh"), col("sh2")), 4).as("jaccard"))
      .orderBy("doc_id")
    def twoStage = {
      val a = Tables.documents(spark, d).select(col("doc_id"), Dedup.shingleCol(col("text")).as("sh"))
      val b = Tables.documents(spark, d).select(col("doc_id"), Dedup.shingleCol(concat(col("text"), lit(" zzz"))).as("sh2"))
      a.join(b, "doc_id").select(col("doc_id"), round(Dedup.jaccardCol(col("sh"), col("sh2")), 4).as("jaccard")).orderBy("doc_id")
    }
    def time(n: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save()
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      println(f"PROBE $n: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("nojoin")(noJoin)
    time("twostage")(twoStage)
    time("nojoin2")(noJoin)
    spark.stop()
  }
}
