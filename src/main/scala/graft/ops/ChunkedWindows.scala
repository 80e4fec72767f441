package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-hardened per-key window operators: sessionization and ±1 offset
  * windows whose partitions are (key, time-chunk) instead of key.
  *
  * The plain spellings — `lag/lead/sum OVER (PARTITION BY user ORDER BY
  * ts)` — serialize each key into ONE sorted window task. Organic user
  * keys are fine; a single pathological key (one bot with billions of
  * events) turns that task into the job. The fix is the
  * [[AsOf.asofBackwardChunked]] carry pattern generalized:
  *
  *   - rows are windowed per (key, chunk) — bounded by chunk density,
  *     never by key volume;
  *   - cross-chunk state rides on per-chunk SUMMARIES (one row per
  *     (key, non-empty chunk)): the previous chunk's last timestamp for
  *     the session-gap test, the previous/next chunk's edge payloads for
  *     offset windows, and a per-key running session-count offset —
  *     windows over the chunk AXIS, orders of magnitude smaller than
  *     the raw stream.
  *
  * Output is equivalence-tested against the plain formulations across
  * chunk widths (ChunkedWindowsSpec). Pick `chunkWidth` so one chunk of
  * the hottest key fits a task — e.g. an hour of events.
  *
  * Working columns `_id _u _ts _ck _prev _f _ff _s _before _feff
  * _lag _lead _firstp _lastp _plast _nfirst _first _last` are reserved;
  * inputs must not use them (checked at runtime — a clashing input
  * would silently corrupt the carry joins otherwise).
  */
object ChunkedWindows {

  private val Reserved: Set[String] = Set(
    "_id", "_u", "_ts", "_ck", "_prev", "_f", "_ff", "_s", "_before",
    "_feff", "_lag", "_lead", "_firstp", "_lastp", "_plast", "_nfirst",
    "_first", "_last")

  private def requireNoReserved(df: DataFrame): Unit = {
    val clash = df.columns.filter(Reserved.contains)
    require(clash.isEmpty,
      s"input frame uses reserved chunked-window working column name(s) " +
        s"${clash.mkString(", ")} — rename them first " +
        s"(reserved: ${Reserved.toSeq.sorted.mkString(", ")})")
  }

  /** Gap-based sessionization, chunked: session_id counts 30-minute-gap
    * (or `gap`-unit) session starts per key in (ts, tie) order — output
    * identical to the plain two-window formulation (q25), one row per
    * input row: (tieCol, keyCol, session_id). */
  def sessionizeChunked(df: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, gap: Long, chunkWidth: Long): DataFrame = {
    require(chunkWidth > 0, s"chunkWidth must be positive: $chunkWidth")
    requireNoReserved(df)
    val e = df.select(col(tieCol).as("_id"), col(keyCol).as("_u"),
        col(tsCol).cast("long").as("_ts"))
      .withColumn("_ck", AsOf.floorDiv("_ts", 0L, chunkWidth))

    // within-chunk gap flags; the first row of each chunk (no in-chunk
    // predecessor) resolves against the carried previous-chunk last ts
    val w = Window.partitionBy("_u", "_ck").orderBy(col("_ts").asc, col("_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = e
      .withColumn("_prev", lag(col("_ts"), 1).over(w))
      .withColumn("_f", when(col("_prev").isNull, lit(null).cast("long"))
        .otherwise(when(col("_ts") - col("_prev") > gap, 1L).otherwise(0L)))

    // per-(key, chunk) summaries + in-chunk session-start counts
    val sums = e.groupBy("_u", "_ck")
      .agg(min("_ts").as("_first"), max("_ts").as("_last"))
    val inStarts = flagged.groupBy("_u", "_ck")
      .agg(sum(coalesce(col("_f"), lit(0L))).as("_s"))

    // chunk axis: previous non-empty chunk's last ts decides the first
    // row's flag; a running sum of per-chunk session starts is the
    // cross-chunk session-id offset
    val wAxis = Window.partitionBy("_u").orderBy(col("_ck").asc)
    val offsets = sums.join(inStarts, Seq("_u", "_ck"))
      .withColumn("_plast", lag(col("_last"), 1).over(wAxis))
      .withColumn("_ff",
        when(col("_plast").isNull || col("_first") - col("_plast") > gap, 1L)
          .otherwise(0L))
      .withColumn("_before", coalesce(
        sum(col("_ff") + col("_s"))
          .over(wAxis.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_u"), col("_ck"), col("_ff"), col("_before"))

    flagged.join(offsets, Seq("_u", "_ck"))
      .withColumn("_feff", coalesce(col("_f"), col("_ff")))
      .withColumn("session_id", col("_before") + sum(col("_feff")).over(run))
      .select(col("_id").as(tieCol), col("_u").as(keyCol), col("session_id"))
  }

  /** ±1 offset windows, chunked: for each row (in (ts, tie) order per
    * key) emits `lag1_<c>` for each lagCol and `lead1_<c>` for each
    * leadCol — the previous/next row's values, crossing chunk boundaries
    * via per-chunk edge-payload summaries. Output = input columns +
    * offset columns, identical to plain lag/lead over a per-key window.
    * (Deeper offsets would carry the first/last N rows per chunk — not
    * needed by the registered queries.) */
  def leadLagChunked(df: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, lagCols: Seq[String], leadCols: Seq[String],
                     chunkWidth: Long): DataFrame = {
    require(chunkWidth > 0, s"chunkWidth must be positive: $chunkWidth")
    requireNoReserved(df)
    val e = df
      .withColumn("_ts", col(tsCol).cast("long"))
      .withColumn("_ck", AsOf.floorDiv("_ts", 0L, chunkWidth))
    val w = Window.partitionBy(col(keyCol), col("_ck"))
      .orderBy(col("_ts").asc, col(tieCol).asc)
    val ordKey = struct(col("_ts"), col(tieCol))

    // within-chunk offsets: lag/lead of the payload STRUCT — null iff no
    // neighbor in the chunk (a struct value itself is never null), which
    // is exactly the boundary-row condition
    val lp = struct(lagCols.map(col): _*)
    val np = struct(leadCols.map(col): _*)
    val within = e
      .withColumn("_lag", lag(lp, 1).over(w))
      .withColumn("_lead", lead(np, 1).over(w))

    // per-chunk edge payloads, carried from the adjacent non-empty chunk
    val sums = e.groupBy(col(keyCol).as("_u"), col("_ck"))
      .agg(max_by(lp, ordKey).as("_lastp"), min_by(np, ordKey).as("_firstp"))
    val wAxis = Window.partitionBy("_u").orderBy(col("_ck").asc)
    val edges = sums
      .withColumn("_plast", lag(col("_lastp"), 1).over(wAxis))
      .withColumn("_nfirst", lead(col("_firstp"), 1).over(wAxis))
      .select(col("_u").as(keyCol), col("_ck"), col("_plast"), col("_nfirst"))

    val joined = within.join(edges, Seq(keyCol, "_ck"))
    val lagOut = lagCols.map(c =>
      when(col("_lag").isNull, col("_plast").getField(c))
        .otherwise(col("_lag").getField(c)).as(s"lag1_$c"))
    val leadOut = leadCols.map(c =>
      when(col("_lead").isNull, col("_nfirst").getField(c))
        .otherwise(col("_lead").getField(c)).as(s"lead1_$c"))
    joined.select(df.columns.map(col) ++ lagOut ++ leadOut: _*)
  }
}
