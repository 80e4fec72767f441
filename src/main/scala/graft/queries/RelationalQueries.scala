package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator surface (SURVEY.md §2.8): scans, projections,
  * filters, joins (broadcast/shuffle/semi/anti), aggregations, windows,
  * sorts/limits, set ops, grouping sets, scalar functions.
  *
  * The reference (traject) has no cross-record relational algebra — its only
  * "join" is the broadcast translation-map lookup
  * (/root/reference/lib/traject/translation_map.rb:187-198) — so this surface
  * is the Spark-native foundation the rest of the engine sits on. Each query
  * is written the way it should run at 100 TB: dimension joins broadcast,
  * fact-fact joins shuffle on their keys, aggregates are partial (map-side
  * combine comes free with groupBy), and all filters/projections sit directly
  * on the parquet scan so pushdown + pruning apply.
  */
object RelationalQueries extends QueryPack {

  /** decimal-exact money math: cast before aggregating, round + double after. */
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan → filter → partial agg → final agg. One shuffle,
    // 4-row result; at 100 TB this is the canonical map-side-combine plan.
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(dec("l_quantity")), 2).cast("double").as("sum_qty"),
          round(sum(dec("l_extendedprice")), 2).cast("double").as("sum_base_price"),
          round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))), 2)
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Pure scan+filter+project: both predicate and projection must reach the
    // parquet reader (PushedFilters / ReadSchema in explain).
    "q02_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-01-01") &&
                col("l_shipdate") < lit("2000-04-01") &&
                col("l_discount") >= 0.08 && col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                col("l_extendedprice"), col("l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Dimension chain: customer ⋈ nation ⋈ region with the two small dims
    // broadcast — zero shuffles for the join itself, one for the agg.
    "q03_join_broadcast" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("num_customers"),
             round(sum(dec("c_acctbal")), 2).cast("double").as("total_acctbal"))
        .orderBy("n_name")
    }),

    // Fact-fact shuffle join on the natural key; AQE picks the exchange plan.
    "q04_join_shuffle" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("line_count"),
             round(sum(dec("l_extendedprice")), 2).cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // Window function: per-customer top-3 orders by price (deterministic
    // tie-break on the unique key).
    "q05_window_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy("o_custkey", "rn")
    }),

    // Global sort + limit = TakeOrderedAndProject (no full sort at scale).
    "q06_topk_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(25)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // DISTINCT = shuffle-dedup on the grouping key.
    "q07_distinct" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_mktsegment")).distinct().orderBy("c_mktsegment")
    }),

    // Set ops: customers who placed both an 'O' and an 'F' order (INTERSECT).
    "q08_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .orderBy("o_custkey")
    }),

    // Anti join: customers with no large order (NOT EXISTS) — the plain
    // "no orders at all" variant is empty at sf0.01, which would make the
    // check trivially green.
    "q09_anti_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    // Semi join: suppliers in nations that actually have customers.
    "q10_semi_join" -> ((s, d) => {
      Tables.supplier(s, d)
        .join(Tables.customer(s, d).select(col("c_nationkey")),
              col("s_nationkey") === col("c_nationkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    }),

    // Aggregate + HAVING.
    "q11_having" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("order_count"),
             round(sum(dec("o_totalprice")), 2).cast("double").as("total_spent"))
        .filter(col("order_count") >= 15)
        .orderBy("o_custkey")
    }),

    // ROLLUP grouping sets over the region/nation hierarchy.
    "q12_rollup" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("num_customers"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // Scalar function surface: string/date/math in one projection.
    "q13_scalar_functions" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_size") <= 5)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 6).as("type_prefix"),
          concat_ws("#", col("p_brand"), col("p_size").cast("string")).as("brand_size"),
          round(dec("p_retailprice") * lit(2).cast("decimal(18,2)"), 2).cast("double").as("double_price"),
          pmod(col("p_partkey"), lit(7)).as("key_mod7"),
          abs(col("p_size") - 3).as("size_dist3"))
        .orderBy("p_partkey")
    }),

    // CASE WHEN bucketing + conditional aggregation.
    "q14_case_buckets" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium")
            .otherwise("large").as("bucket"),
          col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
             round(sum(dec("o_totalprice")), 2).cast("double").as("bucket_total"))
        .orderBy("bucket")
    }),

    // CUBE grouping sets across two independent dimensions.
    "q16_cube" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
    }),

    // Orders above their customer's average price. Spark side: join against
    // a pre-aggregated frame; oracle: correlated scalar subqueries — two
    // different formulations must agree. Compared as price*count > sum in
    // exact decimal (a float average could flip a hairline > either way).
    "q17_above_avg" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val aggs = o.groupBy(col("o_custkey").as("k"))
        .agg(sum(dec("o_totalprice")).as("cust_sum"), count(lit(1)).as("cust_n"))
      o.join(aggs, col("o_custkey") === col("k"))
        .filter(dec("o_totalprice") * col("cust_n") > col("cust_sum"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // EXCEPT ALL (bag semantics) over projections.
    "q18_except_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.select(col("o_custkey"))
        .exceptAll(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .orderBy("o_custkey")
    }),

    // Date arithmetic: parts, day differences, month shifts.
    "q19_date_arithmetic" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") <= 2000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since"),
          add_months(to_date(col("o_orderdate")), 3).as("plus3m"))
        .orderBy("o_orderkey")
    }),

    // Ordered string aggregation per group (deterministic: sorted distinct).
    "q20_string_agg" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_mktsegment")
        .agg(array_join(array_sort(collect_set(col("n_name"))), ",").as("nations"))
        .orderBy("c_mktsegment")
    }),

    // Date/time functions over the events stream table. All event-time
    // queries consume the normalized epoch-µs `ts_us` column that
    // Tables.events emits — the physical type of the raw `ts` (INT64-nanos
    // vs timestamp[us]) is dispatched ONCE there, never per query.
    "q15_events_by_day" -> ((s, d) => {
      Tables.events(s, d)
        .select(to_date(timestamp_micros(col("ts_us"))).as("day"),
                col("event_type"), dec("value").as("v"))
        .groupBy("day", "event_type")
        .agg(count(lit(1)).as("n"),
             round(sum(col("v")), 2).cast("double").as("sum_value"))
        .orderBy("day", "event_type")
    }),

    // PIVOT: per-day value totals spread across event-type columns. The
    // pivot value list is explicit (no discovery pass over the data), so
    // this is one groupBy with conditional aggregates — decimal sums for
    // engine-exact money math, absent (day, type) cells stay null
    "q26_pivot" -> ((s, d) => {
      Tables.events(s, d)
        .select(to_date(timestamp_micros(col("ts_us"))).as("day"),
                col("event_type"), dec("value").as("v"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum(col("v")), 2).cast("double"))
        .orderBy("day")
    }),

    // UNPIVOT (melt): the q26 wide frame back to (day, event_type, value)
    // rows — Spark's unpivot operator, null cells dropped, equivalent to
    // the long-form aggregate (the oracle recomputes it directly)
    "q27_unpivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = Tables.events(s, d)
        .select(to_date(timestamp_micros(col("ts_us"))).as("day"),
                col("event_type"), dec("value").as("v"))
        .groupBy("day")
        .pivot("event_type", types)
        .agg(round(sum(col("v")), 2).cast("double"))
      wide.unpivot(Array(col("day")), types.map(col).toArray,
          "event_type", "sum_value")
        .filter(col("sum_value").isNotNull)
        .orderBy("day", "event_type")
    }),

    // JSON scalar extraction (events.props payloads): get_json_object →
    // typed column → grouped aggregates, all integer-exact
    "q28_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")),

    // ntile quartile assignment per event type (total order: value,
    // event_id) — the remaining window ranking function; integer output
    "q34_ntile" -> ((s, d) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
        .withColumn("quartile", ntile(4).over(w))
        .groupBy("event_type", "quartile")
        .agg(count(lit(1)).as("n"),
          min("value").as("lo"), max("value").as("hi"))
        .orderBy("event_type", "quartile")
    }),

    // LATERAL correlated subquery (the SQL-surface spelling of per-group
    // top-n): top-2 customers by balance per nation — Catalyst rewrites
    // the lateral into a join, exercising the SQL entry path end-to-end
    // the SQL-surface spelling of exact discrete percentiles:
    // graft_percentile_disc (GraftExtensions FunctionRegistry) from
    // spark.sql — a mergeable value->count-map aggregate, exact on the
    // discrete l_quantity domain (50 distinct values), same integer rank
    // convention as q24's Percentiles.Target. One aggregate pass; the
    // shuffle carries one bounded map per task per group.
    "q35_sql_percentile" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT l_returnflag,
          graft_percentile_disc(l_quantity, 1, 2) AS p50,
          graft_percentile_disc(l_quantity, 9, 10) AS p90,
          graft_percentile_disc(l_quantity, 99, 100) AS p99
        FROM lineitem_v GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    "q33_lateral_topn" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.nation(s, d).createOrReplaceTempView("nation_v")
      s.sql("""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation_v n,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer_v c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        ORDER BY n_name, c_custkey""")
    }),

    // cohort retention: users grouped by first-activity day, counted by
    // day offset — two aggregations + one (user) equi-join, all integer
    // date arithmetic; the standard growth-analytics matrix
    "q32_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        to_date(timestamp_micros(col("ts_us"))).as("day"))
      val cohorts = ev.groupBy("user_id").agg(min("day").as("cohort"))
      ev.join(cohorts, "user_id")
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          datediff(col("day"), col("cohort")).as("day_offset"),
          col("user_id"))
        .groupBy("cohort", "day_offset")
        .agg(countDistinct("user_id").as("active_users"))
        .orderBy("cohort", "day_offset")
    }),

    // ordered funnel analysis (view -> click -> purchase): stage
    // reached per user via chained min-after aggregations — each stage
    // is one (user, ts) groupBy + equi-join, exact µs arithmetic; no
    // per-user event-sequence collection, no window sort
    "q31_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_type"), col("ts_us").as("tus"))
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("tus").as("t1"))
      val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("tus") > col("t1"))
        .groupBy("user_id").agg(min("tus").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("tus") > col("t2"))
        .groupBy("user_id").agg(min("tus").as("t3"))
      ev.select(col("user_id")).distinct()
        .join(s1, Seq("user_id"), "left")
        .join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
            .when(col("t1").isNotNull, 1).otherwise(0).as("stage"),
          col("t1"), col("t2"), col("t3"))
        .orderBy("user_id")
    }),

    // time-RANGE window frame: per-user trailing 1-hour count/sum at
    // event granularity — the sliding-window analytics shape. Frames on
    // exact µs longs (RANGE peers identical both engines); decimal sums.
    // Hot-key caveat and its chunked-carry fix: see ops/ChunkedWindows
    "q30_range_window" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("tus")
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          col("ts_us").as("tus"), dec("value").as("v"))
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          round(sum(col("v")).over(w), 2).cast("double").as("sum_1h"))
        .orderBy("event_id")
    }),

    // explicit GROUPING SETS (neither rollup nor cube): per-type and
    // per-day marginals plus the grand total in ONE pass — at scale this
    // beats three scans unioned; grouping_id() disambiguates the
    // all-null grand-total row from real null keys. day as an ISO string:
    // a NULL-bearing DATE column round-trips as datetime64/NaT in one
    // engine's pandas and object/None in the other's
    "q29_grouping_sets" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          date_format(to_date(timestamp_micros(col("ts_us"))),
            "yyyy-MM-dd").as("day"),
          dec("value").as("v"))
        .groupingSets(
          Seq(Seq(col("event_type")), Seq(col("day")), Seq()),
          col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("v")), 2).cast("double").as("total"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("event_type").asc_nulls_first,
          col("day").asc_nulls_first)),

    // backward as-of join (graft.ops.AsOf): each click gets the latest
    // preceding view per user. Times compared at µs (Tables.events ts_us;
    // DuckDB timestamps are µs) and the right side is
    // deduplicated per (user, µs) so the match is deterministic in both
    // engines. One shuffle, no nested loop — see AsOf.asofBackward.
    "q21_asof_join" -> ((s, d) => {
      val (clicks, views) = clicksAndViews(s, d)
      graft.ops.AsOf.asofBackward(clicks, dedupViews(views),
          Seq("user_id"), "click_ts_us", "ts_us", "event_id",
          payload = Seq("event_id", "value"), prefix = "view_")
        .orderBy("click_id")
    }),

    // forward as-of join through the skew-hardened CHUNKED path: each
    // click gets the EARLIEST view at-or-after it per user
    // (AsOf.asofForwardChunked — windows bounded by per-chunk density,
    // a hot user never serializes one task; output equivalence-tested
    // against the plain forward join across chunk widths). Right side
    // deduplicated per (user, µs) keeping the MIN event_id — forward
    // semantics pick the smallest (time, tie), so the surviving row is
    // the one both engines agree on.
    // fixed hourly grid per user with LOCF gap fill: pandas
    // resample().ffill() as one bounded-window Spark plan; grid bounds
    // are per-key aggregates, the fill window partitions by user
    "q37_resample_locf" -> ((s, d) =>
      graft.ops.Resample.resampleLocf(Tables.events(s, d), "user_id",
          "ts_us", col("value"), stepUs = 3600000000L)
        .orderBy("user_id", "bucket_us")),

    "q36_asof_forward" -> ((s, d) => {
      val (clicks, views) = clicksAndViews(s, d)
      graft.ops.AsOf.asofForwardChunked(clicks, dedupViewsMin(views),
          Seq("user_id"), "click_ts_us", "ts_us", "event_id",
          payload = Seq("event_id", "value"), chunkWidth = 3600000000L,
          prefix = "view_")
        .orderBy("click_id")
    }),

    // time-band (range) join: every (click, view) pair within the
    // preceding hour per user — bucketed equi-join, never a nested loop
    "q22_band_join" -> ((s, d) => {
      val (clicks, views) = clicksAndViews(s, d)
      graft.ops.AsOf.bandJoin(clicks, views, Seq("user_id"),
          "click_ts_us", "ts_us", lower = -3600000000L, upper = 0L,
          payload = Seq("event_id", "value"), prefix = "view_")
        .orderBy("click_id", "view_event_id")
    }),

    // batch sessionization: 30-minute-gap session ids per user. Chunked
    // windows (ops/ChunkedWindows): partitions are (user, hour-chunk),
    // cross-chunk state carried on per-chunk summaries — a single bot
    // user with billions of events cannot serialize one window task the
    // way the plain per-user window does. Output equivalence-tested
    // against the plain two-window formulation across chunk widths.
    // The streaming analog lives in graft.streaming
    // (mapGroupsWithState sessions).
    // per-user session features on top of the skew-hardened sessionizer:
    // all-integer aggregates (counts, epoch-us durations) plus one exact
    // quotient, so the rollup is engine-portable bit-for-bit
    "q38_session_stats" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val sess = graft.ops.ChunkedWindows.sessionizeChunked(ev,
          keyCol = "user_id", tsCol = "ts_us", tieCol = "event_id",
          gap = 1800000000L, chunkWidth = 3600000000L)
        .join(ev.select(col("event_id"), col("ts_us")), "event_id")
      val perSession = sess.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_ev"),
          (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"))
      perSession.groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_ev")).as("n_events"),
          sum(col("dur_us")).as("total_dur_us"),
          max(col("n_ev")).as("max_session_events"))
        .withColumn("events_per_session",
          col("n_events") / col("n_sessions").cast("double"))
        .orderBy("user_id")
    }),

    // warehouse MERGE upsert: apply a change batch (value updates on
    // %7 keys, NO-OP copies on %11 keys, inserts at +1M on %13 keys) to
    // the customer dimension. One full-outer equi-join on the key — the
    // base scans once; change detection (null-safe column compare) rides
    // the join projection, so no-op updates grade as 'keep' (the CDC
    // audit convention), never as fake rewrites. All values pass through
    // untouched or get one exact double addition — engine-portable
    "q39_merge_upsert" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val updates = base.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), col("c_name"),
            (col("c_acctbal") + lit(10.0)).as("c_acctbal"))
        .unionByName(base.filter(col("c_custkey") % 11 === 0 &&
          col("c_custkey") % 7 =!= 0))
        // inserts ride a 1e12 offset: customer keys are 150k*sf, so a
        // 1M offset would collide with REAL keys at sf >= ~7 and break
        // merge's unique-key contract the moment the registry benches
        // above the pinned scales
        .unionByName(base.filter(col("c_custkey") % 13 === 0)
          .select((col("c_custkey") + 1000000000000L).as("c_custkey"),
            concat(col("c_name"), lit(" new")).as("c_name"),
            lit(1.23).as("c_acctbal")))
      graft.ops.Upsert.merge(base, updates, Seq("c_custkey"))
        .orderBy("c_custkey")
    }),

    "q25_sessionize" -> ((s, d) => {
      graft.ops.ChunkedWindows.sessionizeChunked(
          Tables.events(s, d)
            .select(col("event_id"), col("user_id"), col("ts_us")),
          keyCol = "user_id", tsCol = "ts_us", tieCol = "event_id",
          gap = 1800000000L, chunkWidth = 3600000000L)
        .select(col("event_id"), col("user_id"), col("session_id"))
        .orderBy("event_id")
    }),

    // discrete percentiles (p50/p90/p99 of value per event type): the
    // emitted number is an actual member value selected by an integer
    // rank (smallest value with CDF >= p), so it is bit-identical across
    // engines — interpolated percentiles differ by 1 ulp in op order.
    // EXACT and scale-safe: distributed selection (ops/Percentiles) —
    // pivot-histogram descent, never a per-group sort. The old window
    // spelling (row_number over a partition keyed by event_type) sorts
    // the whole table on ~|event_type| tasks at any scale.
    "q24_percentile_disc" -> ((s, d) => {
      import graft.ops.Percentiles
      Percentiles.exactDiscrete(
          Tables.events(s, d).select(col("event_type"), col("value")),
          Seq("event_type"), "value",
          Seq(Percentiles.Target("p50", 1, 2), Percentiles.Target("p90", 9, 10),
            Percentiles.Target("p99", 99, 100)))
        .orderBy("event_type", "pct")
    }),

    // offset windows (lead/lag): per-user session deltas. Ordering is
    // total — (ts_us, event_id) — so offsets are deterministic; values
    // pass through untouched (exact doubles, no arithmetic). Chunked
    // (ops/ChunkedWindows): boundary rows pull edge payloads from the
    // adjacent chunk's summary, so a hot key never serializes a task.
    "q23_lead_lag" -> ((s, d) => {
      graft.ops.ChunkedWindows.leadLagChunked(
          Tables.events(s, d)
            .select(col("event_id"), col("user_id"),
              col("ts_us"), col("event_type"), col("value")),
          keyCol = "user_id", tsCol = "ts_us", tieCol = "event_id",
          lagCols = Seq("value", "ts_us"), leadCols = Seq("event_type"),
          chunkWidth = 3600000000L)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("lag1_value").as("prev_value"),
          col("lead1_event_type").as("next_type"),
          (col("ts_us") - col("lag1_ts_us")).as("gap_us"))
        .orderBy("event_id")
    })
  )

  /** Shared q21/q22 inputs: clicks and views off one events scan, times
    * as µs longs (Tables.events' normalized `ts_us` — matches DuckDB's
    * epoch_us exactly for the positive epochs in play). */
  private def clicksAndViews(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, d).select(col("event_id"),
      col("ts_us"), col("user_id"), col("event_type"),
      col("value"))
    (ev.filter(col("event_type") === "click")
       .select(col("event_id").as("click_id"), col("user_id"),
         col("ts_us").as("click_ts_us"), col("value").as("click_value")),
     ev.filter(col("event_type") === "view")
       .select(col("user_id"), col("ts_us"), col("event_id"), col("value")))
  }

  /** One view per (user, µs): max event_id survives, mirroring the
    * oracle's QUALIFY — makes the as-of match unique. */
  private def dedupViews(views: DataFrame): DataFrame = views
    .withColumn("_rn", row_number().over(
      Window.partitionBy("user_id", "ts_us").orderBy(col("event_id").desc)))
    .filter(col("_rn") === 1).drop("_rn")

  /** Forward twin of [[dedupViews]]: MIN event_id survives — forward
    * as-of picks the smallest (time, tie), so this is the row the engine
    * would match among equal-µs ties. */
  private def dedupViewsMin(views: DataFrame): DataFrame = views
    .withColumn("_rn", row_number().over(
      Window.partitionBy("user_id", "ts_us").orderBy(col("event_id").asc)))
    .filter(col("_rn") === 1).drop("_rn")

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2000-04-01'
           AND l_discount >= 0.08 AND l_quantity > 40
         ORDER BY l_orderkey, l_linenumber""",

    "q03_join_broadcast" ->
      """SELECT n_name, count(*) AS num_customers,
         CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name""",

    "q04_join_shuffle" ->
      """SELECT o_orderpriority, count(*) AS line_count,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F'
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q05_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q06_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""",

    "q07_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "q08_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",

    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         ORDER BY c_custkey""",

    "q10_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = s_nationkey)
         ORDER BY s_suppkey""",

    "q11_having" ->
      """SELECT o_custkey, count(*) AS order_count,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_spent
         FROM orders GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey""",

    "q12_rollup" ->
      """SELECT r_name, n_name, count(*) AS num_customers
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",

    "q13_scalar_functions" ->
      """SELECT p_partkey, upper(p_name) AS name_upper, length(p_name) AS name_len,
         substring(p_type, 1, 6) AS type_prefix,
         concat_ws('#', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
         CAST(round(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(2 AS DECIMAL(18,2)), 2) AS DOUBLE) AS double_price,
         p_partkey % 7 AS key_mod7,
         abs(p_size - 3) AS size_dist3
         FROM part WHERE p_size <= 5 ORDER BY p_partkey""",

    "q14_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 200000 THEN 'medium'
                     ELSE 'large' END AS bucket,
         count(*) AS n,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS bucket_total
         FROM orders GROUP BY 1 ORDER BY bucket""",

    "q16_cube" ->
      """SELECT n_name, c_mktsegment, count(*) AS n
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY CUBE(n_name, c_mktsegment)
         ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""",

    "q17_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
         WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
               (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
             > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders i
                WHERE i.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""",

    "q18_except_all" ->
      """SELECT o_custkey, count(*) AS n FROM (
           SELECT o_custkey FROM orders
           EXCEPT ALL
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
         GROUP BY o_custkey ORDER BY o_custkey""",

    "q19_date_arithmetic" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INT) AS days_since,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
         FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",

    "q20_string_agg" ->
      """SELECT c_mktsegment,
           string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q15_events_by_day" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
         CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",

    "q26_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
         CAST(round(sum(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS click,
         CAST(round(sum(CASE WHEN event_type = 'error'    THEN CAST(value AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS error,
         CAST(round(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS purchase,
         CAST(round(sum(CASE WHEN event_type = 'signup'   THEN CAST(value AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS signup,
         CAST(round(sum(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS view
         FROM events GROUP BY 1 ORDER BY day""",

    "q34_ntile" ->
      """WITH q AS (
           SELECT event_id, event_type, value,
             ntile(4) OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS quartile
           FROM events)
         SELECT event_type, quartile, count(*) AS n,
                min(value) AS lo, max(value) AS hi
         FROM q GROUP BY 1, 2 ORDER BY event_type, quartile""",

    // member-at-rank-k twin of the aggregate: rank k = (num*(n+1)) DIV den
    // (no clamp needed: 0 < num < den keeps k in [1, n] for n >= 1)
    "q35_sql_percentile" ->
      """WITH s AS (
           SELECT l_returnflag, l_quantity AS v,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem)
         SELECT l_returnflag,
           max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS p50,
           max(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS p90,
           max(CASE WHEN rn = (99 * n + 99) // 100 THEN v END) AS p99
         FROM s GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q33_lateral_topn" ->
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
         FROM nation n,
         LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
         ORDER BY n_name, c_custkey""",

    // cohort as ISO string (non-null, but symmetric with the q29 rule);
    // datediff == date subtraction in days on both engines
    "q32_cohort_retention" ->
      """WITH ev AS (
           SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         c AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY 1)
         SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort,
           CAST(ev.day - c.cohort AS INT) AS day_offset,
           CAST(count(DISTINCT ev.user_id) AS BIGINT) AS active_users
         FROM ev JOIN c USING (user_id)
         GROUP BY 1, 2 ORDER BY cohort, day_offset""",

    "q31_funnel" ->
      """WITH ev AS (
           SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
         s1 AS (SELECT user_id, min(tus) AS t1 FROM ev
                WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(e.tus) AS t2
                FROM ev e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.tus > s1.t1 GROUP BY 1),
         s3 AS (SELECT e.user_id, min(e.tus) AS t3
                FROM ev e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.tus > s2.t2 GROUP BY 1),
         u AS (SELECT DISTINCT user_id FROM ev)
         SELECT u.user_id,
           CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
           t1, t2, t3
         FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
                LEFT JOIN s3 USING (user_id)
         ORDER BY user_id""",

    "q30_range_window" ->
      """SELECT event_id, count(*) OVER w AS n_1h,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))) OVER w, 2) AS DOUBLE)
             AS sum_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    // GROUPING() bitmask: first argument = most significant bit on both
    // engines, so gid disambiguates identically
    "q29_grouping_sets" ->
      """SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total,
           CAST(GROUPING(event_type, day) AS BIGINT) AS gid
         FROM events
         GROUP BY GROUPING SETS ((event_type), (day), ())
         ORDER BY gid, event_type ASC NULLS FIRST, day ASC NULLS FIRST""",

    // sum(BIGINT) is HUGEINT in DuckDB — cast back (see the verify skill)
    "q28_json_extract" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
         max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY 1 ORDER BY event_type""",

    // pivot→unpivot roundtrip == the long-form aggregate
    "q27_unpivot" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",

    "q21_asof_join" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id,
                            event_type, value FROM events),
         views AS (SELECT user_id, ts_us, event_id, value FROM ev
                   WHERE event_type = 'view'
                   QUALIFY row_number() OVER (PARTITION BY user_id, ts_us
                                              ORDER BY event_id DESC) = 1),
         clicks AS (SELECT event_id AS click_id, user_id,
                           ts_us AS click_ts_us, value AS click_value
                    FROM ev WHERE event_type = 'click')
         SELECT c.click_id, c.user_id, c.click_ts_us, c.click_value,
                v.event_id AS view_event_id, v.value AS view_value
         FROM clicks c ASOF LEFT JOIN views v
           ON c.user_id = v.user_id AND c.click_ts_us >= v.ts_us
         ORDER BY c.click_id""",

    // forward direction: ASOF with the inequality flipped picks the
    // smallest v.ts_us >= click; ties pre-collapsed to MIN event_id
    // same integer bucket grid (epoch-us DIV-aligned), same decimal-sum
    // rounding, same IGNORE NULLS carry within the unbounded-to-current
    // frame; first bucket per user is occupied so v_filled is total
    "q37_resample_locf" ->
      """WITH ev AS (
           SELECT user_id,
             epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us,
             CAST(value AS DECIMAL(18,2)) AS v
           FROM events),
         hourly AS (
           SELECT user_id, bucket_us, count(*) AS n,
             CAST(round(sum(v), 2) AS DOUBLE) AS s
           FROM ev GROUP BY 1, 2),
         bounds AS (
           SELECT user_id, min(bucket_us) AS lo, max(bucket_us) AS hi
           FROM hourly GROUP BY 1),
         grid AS (
           SELECT user_id, unnest(generate_series(lo, hi, 3600000000))
             AS bucket_us
           FROM bounds),
         j AS (
           SELECT g.user_id, g.bucket_us, h.n, h.s
           FROM grid g LEFT JOIN hourly h
             ON g.user_id = h.user_id AND g.bucket_us = h.bucket_us)
         SELECT user_id, bucket_us,
           CAST(coalesce(n, 0) AS BIGINT) AS n,
           coalesce(s, last_value(s IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS v_filled,
           CAST(s IS NULL AS INT) AS filled
         FROM j ORDER BY user_id, bucket_us""",

    "q36_asof_forward" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id,
                            event_type, value FROM events),
         views AS (SELECT user_id, ts_us, event_id, value FROM ev
                   WHERE event_type = 'view'
                   QUALIFY row_number() OVER (PARTITION BY user_id, ts_us
                                              ORDER BY event_id ASC) = 1),
         clicks AS (SELECT event_id AS click_id, user_id,
                           ts_us AS click_ts_us, value AS click_value
                    FROM ev WHERE event_type = 'click')
         SELECT c.click_id, c.user_id, c.click_ts_us, c.click_value,
                v.event_id AS view_event_id, v.value AS view_value
         FROM clicks c ASOF LEFT JOIN views v
           ON c.user_id = v.user_id AND c.click_ts_us <= v.ts_us
         ORDER BY c.click_id""",

    "q22_band_join" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id,
                            event_type, value FROM events),
         views AS (SELECT user_id, ts_us, event_id, value FROM ev
                   WHERE event_type = 'view'),
         clicks AS (SELECT event_id AS click_id, user_id,
                           ts_us AS click_ts_us, value AS click_value
                    FROM ev WHERE event_type = 'click')
         SELECT c.click_id, c.user_id, c.click_ts_us, c.click_value,
                v.event_id AS view_event_id, v.value AS view_value
         FROM clicks c JOIN views v ON c.user_id = v.user_id
           AND v.ts_us BETWEEN c.click_ts_us - 3600000000 AND c.click_ts_us
         ORDER BY c.click_id, view_event_id""",

    // identical session assignment (the q25 CTE), then two integer
    // aggregates; events_per_session is one exact IEEE quotient
    "q38_session_stats" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
         g AS (
           SELECT event_id, user_id, ts_us,
             CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
                  WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
                  ELSE 0 END AS new_s
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         se AS (
           SELECT event_id, user_id, ts_us,
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM g),
         ps AS (
           SELECT user_id, session_id, count(*) AS n_ev,
             max(ts_us) - min(ts_us) AS dur_us
           FROM se GROUP BY 1, 2)
         SELECT user_id,
           count(*) AS n_sessions,
           CAST(sum(n_ev) AS BIGINT) AS n_events,
           CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
           CAST(max(n_ev) AS BIGINT) AS max_session_events,
           sum(n_ev) / CAST(count(*) AS DOUBLE) AS events_per_session
         FROM ps GROUP BY user_id ORDER BY user_id""",

    // the same MERGE as one full outer join; matched-and-equal rows are
    // 'keep' (no-op detection), update rows win wholly when changed
    "q39_merge_upsert" ->
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
         upd AS (
           SELECT c_custkey, c_name, c_acctbal + 10.0 AS c_acctbal
           FROM base WHERE c_custkey % 7 = 0
           UNION ALL
           SELECT c_custkey, c_name, c_acctbal
           FROM base WHERE c_custkey % 11 = 0 AND c_custkey % 7 <> 0
           UNION ALL
           SELECT c_custkey + 1000000000000, c_name || ' new', 1.23
           FROM base WHERE c_custkey % 13 = 0)
         SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
                CASE WHEN u.c_custkey IS NULL THEN b.c_name
                     ELSE u.c_name END AS c_name,
                CASE WHEN u.c_custkey IS NULL THEN b.c_acctbal
                     ELSE u.c_acctbal END AS c_acctbal,
                CASE WHEN b.c_custkey IS NULL THEN 'insert'
                     WHEN u.c_custkey IS NULL THEN 'keep'
                     WHEN u.c_name = b.c_name
                       AND u.c_acctbal = b.c_acctbal THEN 'keep'
                     ELSE 'update' END AS action
         FROM base b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
         ORDER BY c_custkey""",

    "q25_sessionize" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
         g AS (
           SELECT event_id, user_id, ts_us,
             CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
                  WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
                  ELSE 0 END AS new_s
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
         SELECT event_id, user_id,
           CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         FROM g ORDER BY event_id""",

    "q24_percentile_disc" ->
      """WITH s AS (
           SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events)
         SELECT event_type,
           CASE WHEN rn = (n + 1) // 2 THEN 'p50'
                WHEN rn = (9 * n + 9) // 10 THEN 'p90'
                ELSE 'p99' END AS pct,
           value
         FROM s
         WHERE rn IN ((n + 1) // 2, (9 * n + 9) // 10, (99 * n + 99) // 100)
         ORDER BY event_type, pct""",

    "q23_lead_lag" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                            event_type, value FROM events)
         SELECT event_id, user_id, ts_us,
           lag(value, 1) OVER w AS prev_value,
           lead(event_type, 1) OVER w AS next_type,
           ts_us - lag(ts_us, 1) OVER w AS gap_us
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
         ORDER BY event_id"""
  )
}
