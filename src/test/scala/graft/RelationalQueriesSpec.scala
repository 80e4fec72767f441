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

  test("q02 pushes filters into the parquet scan") {
    val df = RelationalQueries.queries("q02_filter_project")(spark, sfSmoke)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), scan)
    assert(scan.contains("l_discount"), "discount filter should be pushed")
  }
}
