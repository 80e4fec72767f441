package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** graft_topk: the bounded replacement for row_number-over-window top-k. */
class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("topk matches the window formulation it replaces, including ties") {
    // deterministic scores with heavy ties so the (score desc, id asc)
    // tie-break is actually exercised; 16 input partitions so partial
    // buffers serialize, ship, and merge
    val scored = (1L to 5000L)
      .map(i => (i % 7, (i % 11).toDouble / 10.0, i))
      .toDF("query_id", "cosine", "neighbor_id")
      .repartition(16)

    val viaAgg = scored.groupBy($"query_id")
      .agg(TopKAggregate.topk($"cosine", $"neighbor_id", 5).as("top"))
      .select($"query_id", posexplode($"top").as(Seq("pos", "c")))
      .select($"query_id", $"c.id".as("neighbor_id"),
        $"c.score".as("cosine"), ($"pos" + 1).as("rank"))

    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id".asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"neighbor_id", $"cosine", $"rank")

    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
  }

  test("topk keeps fewer than k rows when the group is small, skips null scores") {
    val scored = Seq(
      (1L, Some(0.9), 10L), (1L, None, 11L), (1L, Some(0.8), 12L),
      (2L, None, 20L)
    ).toDF("query_id", "cosine", "neighbor_id")
    val got = scored.groupBy($"query_id")
      .agg(TopKAggregate.topk($"cosine", $"neighbor_id", 5).as("top"))
      .select($"query_id", $"top.id".as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(10L, 12L))
    assert(got(2L) == Seq.empty)
  }

  test("topk aggregates map-side: partial reduction before the exchange") {
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    // AQE off: inspect the fully-prepared plan (EnsureRequirements applied),
    // where the groupBy exchange is visible
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val scored = (1L to 100L).map(i => (i % 3, i.toDouble, i))
        .toDF("query_id", "cosine", "neighbor_id")
        .repartition(4, $"neighbor_id")
      val agg = scored.groupBy($"query_id")
        .agg(TopKAggregate.topk($"cosine", $"neighbor_id", 3).as("top"))
      val plan = agg.queryExecution.executedPlan
      // partial ObjectHashAggregate below the shuffle = bounded exchange;
      // and no window/sort anywhere in the top-k path
      val aggs = plan.collect { case o: ObjectHashAggregateExec => o }
      assert(aggs.size == 2, s"expected partial+final ObjectHashAggregate:\n$plan")
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      // the groupBy exchange must sit ABOVE the partial aggregate, so the
      // shuffle carries ≤ k-row buffers per (task, query), never raw triples
      val aggExchanges = plan.collect { case e: ShuffleExchangeExec
        if e.child.exists(_.isInstanceOf[ObjectHashAggregateExec]) => e }
      assert(aggExchanges.nonEmpty,
        s"shuffle input must already be partially aggregated:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
