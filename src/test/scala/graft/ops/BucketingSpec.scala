package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle on either side") {
    val orders = Tables.orders(spark, sfSmoke)
    val lineitem = Tables.lineitem(spark, sfSmoke)

    // clean slate: drop catalog entries AND their managed locations
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", numBuckets = 8)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "lo_orderkey"),
      "b_lineitem", "lo_orderkey", numBuckets = 8)

    // force the sort-merge path (at sf0.001 the dim side would broadcast,
    // which hides the property under test)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders",
        "lo_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)

      // and it computes the same result as the shuffled join
      val expected = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
