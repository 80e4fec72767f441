package graft

import graft.queries.RelationalQueries

class RelationalQueriesSpec extends SparkSpec {

  test("every relational query runs and returns rows on sf0.001") {
    RelationalQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfSmoke)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has oracle SQL and aliased column parity is plausible") {
    val qs = RelationalQueries.queries.keySet
    val os = RelationalQueries.oracleSql.keySet
    assert(os.subsetOf(qs))
    assert(qs == os, s"queries without oracle: ${qs -- os}")
  }

  test("q01 pricing summary values are stable") {
    val rows = RelationalQueries.queries("q01_pricing_summary")(spark, sfSmoke)
      .collect()
    assert(rows.length >= 4)
    val first = rows.head
    assert(first.getAs[String]("l_returnflag") == "A")
    assert(first.getAs[Long]("count_order") > 0)
  }

  test("q03 broadcast join plan actually broadcasts the dimensions") {
    val df = RelationalQueries.queries("q03_join_broadcast")(spark, sfSmoke)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("approx_percentile tracks the exact discrete percentiles (q24's scale path)") {
    import org.apache.spark.sql.functions._
    // q24's registered formulation is exact distributed selection
    // (ops/Percentiles); approx_percentile is the one-pass alternative
    // when a rank-bounded answer suffices. Its contract is RANK error
    // (<= n/accuracy), not value error — adjacent order statistics can be
    // far apart — so assert the approx value lies within a few ranks of
    // the exact index in each group's sorted values.
    val byGroup = graft.Tables.events(spark, sfSmoke)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    val approx = graft.Tables.events(spark, sfSmoke)
      .groupBy("event_type")
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    for ((g, vals) <- byGroup; (p, i) <- Seq(0.5, 0.9, 0.99).zipWithIndex) {
      val n = vals.length
      val idx = math.ceil(p * n).toInt - 1              // q24's exact index
      val allow = n / 10000 + 2                         // rank-error bound + slack
      val (lo, hi) = (vals(math.max(0, idx - allow)), vals(math.min(n - 1, idx + allow)))
      val ap = approx(g)(i)
      assert(ap >= lo && ap <= hi,
        s"$g p$p: approx $ap outside ranks [$lo, $hi] around exact ${vals(idx)}")
    }
  }

  test("q02 pushes filters into the parquet scan") {
    val df = RelationalQueries.queries("q02_filter_project")(spark, sfSmoke)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), scan)
    assert(scan.contains("l_discount"), "discount filter should be pushed")
  }
}
