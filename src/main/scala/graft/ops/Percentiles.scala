package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Exact discrete percentiles (the smallest member value whose rank
  * reaches ceil-style target ranks) WITHOUT a per-group sort.
  *
  * The naive exact plan — `row_number() OVER (PARTITION BY grp ORDER BY
  * value)` — sorts each group on one task; with a low-cardinality group
  * key (q24's event_type: a handful of values) that is a full-table sort
  * on ~5 tasks at ANY scale. This is distributed selection instead:
  *
  *   1. one aggregate pass per group: (n, min, max) → target rank k per
  *      percentile;
  *   2. iterative refinement: per active (group, percentile) state, the
  *      driver picks `buckets-1` explicit pivot VALUES inside (lo, hi);
  *      one scan counts rows per (state, bucket) — bucket membership is
  *      a comparison against concrete doubles, so the partition is exact
  *      (no float-boundary ambiguity) — and the driver descends into the
  *      bucket containing rank k. Each pass shrinks the candidate count
  *      by ~`buckets`×, so passes = log_buckets(n / threshold): 3-4 full
  *      scans at 100 TB, each a narrow (group, value) projection with
  *      map-side combine, shuffling only states×buckets count rows;
  *   3. once a state's candidate count <= threshold, one final job
  *      collects the surviving values per state (bounded by threshold)
  *      and selects the k-th smallest.
  *
  * Ties need no special handling: rank-k BY VALUE emits the same value
  * as rank-k by (value, tiebreaker), because sorting permutes only equal
  * values. Driver state is O(groups × percentiles × buckets) — the same
  * bounded-driver contract as Packing/Sampling's prefix sums. NULL
  * values are excluded (SQL percentile semantics).
  */
object Percentiles {

  /** Target: output label + rank formula `k = clamp((num*(n+1)) DIV den,
    * 1, n)` — the discrete-percentile rank convention shared with the
    * window formulation and DuckDB's member selection in q24. */
  final case class Target(label: String, num: Long, den: Long)

  private final case class State(
    sid: Int, gk: String, groupVals: Row, label: String,
    lo: Double, hi: Double, k: Long, cnt: Long)

  /** (groupCols..., pct, value): one row per group × target.
    *
    * Group-cardinality contract: driver state is O(groups × percentiles
    * × buckets), so the group key must be LOW-cardinality (q24's
    * event_type: a handful of states). `maxGroups` bounds it loudly —
    * the driver materializes at most maxGroups+1 aggregate rows (take,
    * not collect) and fails with guidance instead of OOMing. For
    * high-cardinality keys use the plain window formulation
    * (`percentile_disc OVER (PARTITION BY key)`): with many groups each
    * per-group sort is small, which is exactly when windows are fine and
    * this machinery is not needed. */
  def exactDiscrete(df0: DataFrame, groupCols: Seq[String], valueCol: String,
                    targets: Seq[Target], buckets: Int = 64,
                    threshold: Long = 10000L, maxGroups: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty && targets.nonEmpty)
    require(buckets >= 2 && threshold >= 1 && maxGroups >= 1)
    val spark = df0.sparkSession
    val keyed = df0
      .select(groupCols.map(col) :+ col(valueCol).cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
      .withColumn("_gk", to_json(struct(groupCols.map(col): _*)))

    // 1. per-group extent + count (one narrow aggregate); bounded take —
    // the driver never holds more than maxGroups+1 rows even when the
    // caller hands us a 10M-group key by mistake
    val base = keyed.groupBy("_gk")
      .agg(first(struct(groupCols.map(col): _*)).as("_gv"),
        count(lit(1)).as("_n"), min("_v").as("_mn"), max("_v").as("_mx"))
      .take(maxGroups + 1)
    require(base.length <= maxGroups,
      s"exactDiscrete observed more than $maxGroups groups on " +
        s"${groupCols.mkString("(", ", ", ")")} — driver selection state " +
        "is O(groups × percentiles × buckets), so this operator is for " +
        "LOW-cardinality group keys. For high-cardinality keys use " +
        "percentile_disc OVER (PARTITION BY ...): per-group sorts are " +
        "small exactly when groups are many. (Raise maxGroups only if " +
        "you have measured the driver headroom.)")

    var resolved = Vector.empty[(Row, String, Double)] // (groupVals, label, value)
    var active = Vector.empty[State]
    var nextSid = 0
    for (r <- base) {
      val (gk, gv, n) = (r.getString(0), r.getStruct(1), r.getLong(2))
      val (mn, mx) = (r.getDouble(3), r.getDouble(4))
      for (t <- targets) {
        val k = math.max(1L, math.min(n, (t.num * (n + 1)) / t.den))
        if (mn == mx) resolved :+= ((gv, t.label, mn))
        else { active :+= State(nextSid, gk, gv, t.label, mn, mx, k, n); nextSid += 1 }
      }
    }

    import spark.implicits._
    var finals = Vector.empty[State]
    while (active.nonEmpty) {
      val (small, large) = active.partition(_.cnt <= threshold)
      finals ++= small
      // states whose interval no longer yields pivots strictly inside
      // (lo, hi) — a point mass on adjacent doubles — cannot subdivide;
      // their distinct-value set is tiny, resolve them with the finals
      val (degenerate, splittable) = large.partition(s => pivotsFor(s, buckets).isEmpty)
      finals ++= degenerate
      active = splittable
      if (active.nonEmpty) {
        val stDf = broadcast(active.map(s =>
            (s.sid, s.gk, s.lo, s.hi, pivotsFor(s, buckets)))
          .toDF("_sid", "_gk", "_lo", "_hi", "_pv"))
        // bucket = #{pivots <= v}: exact comparisons against concrete
        // doubles, monotone in v, so buckets partition [lo, hi] exactly
        val hist = keyed.join(stDf, "_gk")
          .filter(col("_v") >= col("_lo") && col("_v") <= col("_hi"))
          .withColumn("_b", expr(
            "aggregate(_pv, 0, (acc, p) -> acc + IF(_v >= p, 1, 0))"))
          .groupBy("_sid", "_b")
          .agg(count(lit(1)).as("_c"), min("_v").as("_bmn"), max("_v").as("_bmx"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) ->
            ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
        def cntAt(sid: Int, b: Int): Long = hist.get((sid, b)).map(_._1).getOrElse(0L)
        val updated = active.map { s =>
          val pv = pivotsFor(s, buckets)
          var (b, before) = (0, 0L)
          while (before + cntAt(s.sid, b) < s.k) { before += cntAt(s.sid, b); b += 1 }
          val (c, bmn, bmx) = hist((s.sid, b))
          // a single-value bucket IS the answer — skip the descent
          if (bmn == bmx) Left((s.groupVals, s.label, bmn))
          else {
            val nLo = if (b == 0) s.lo else pv(b - 1)
            val nHi = if (b == pv.length) s.hi else Math.nextDown(pv(b))
            // tighten to the observed extent: shrinks point-heavy buckets
            // far faster than the geometric pivot descent alone
            Right(s.copy(lo = math.max(nLo, bmn), hi = math.min(nHi, bmx),
              k = s.k - before, cnt = c))
          }
        }
        resolved ++= updated.collect { case Left(r) => r }
        active = updated.collect { case Right(s) => s }
      }
    }

    // 3. one bounded job for every final state: (sid, value) counts —
    // distinct values per state <= threshold (or <= a handful for
    // non-subdividable point-mass intervals), so the driver walk is small
    if (finals.nonEmpty) {
      val stDf = broadcast(finals.map(s => (s.sid, s.gk, s.lo, s.hi))
        .toDF("_sid", "_gk", "_lo", "_hi"))
      val counts = keyed.join(stDf, "_gk")
        .filter(col("_v") >= col("_lo") && col("_v") <= col("_hi"))
        .groupBy("_sid", "_v").agg(count(lit(1)).as("_c"))
        .collect()
        .groupBy(_.getInt(0))
      resolved ++= finals.map { s =>
        val vals = counts(s.sid).map(r => (r.getDouble(1), r.getLong(2)))
          .sortBy(_._1)
        var (i, seen) = (0, 0L)
        while (seen + vals(i)._2 < s.k) { seen += vals(i)._2; i += 1 }
        (s.groupVals, s.label, vals(i)._1)
      }
    }

    val groupSchema = StructType(groupCols.map(c =>
      StructField(c, df0.schema(c).dataType, nullable = true)))
    val outSchema = StructType(groupSchema.fields :+
      StructField("pct", StringType) :+ StructField("value", DoubleType))
    val rows = resolved.map { case (gv, label, v) =>
      Row.fromSeq(gv.toSeq :+ label :+ v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), outSchema)
  }

  private def pivotsFor(s: State, buckets: Int): Array[Double] = {
    val span = s.hi - s.lo
    (1 until buckets)
      .map(j => s.lo + span * j / buckets)
      .filter(p => p > s.lo && p < s.hi)
      .distinct.toArray
  }
}
