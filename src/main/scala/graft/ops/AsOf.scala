package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Time-series joins Spark's DataFrame API lacks as built-ins: backward
  * as-of join and bounded time-band (range) join. Feature-engineering
  * staples ("latest reading at or before this event", "all events within
  * the preceding hour") for event/training-data pipelines.
  *
  * Both are formulated to scale:
  *  - the naive as-of is a per-row ORDER BY ... LIMIT 1 lateral — O(n·m)
  *    or a nested-loop join. Here it is a tagged UNION + one running
  *    `last` window per key: ONE shuffle on the key, one partition-local
  *    sort, O(n+m) total, no join at all.
  *  - the naive range join is an inequality join — BroadcastNestedLoop in
  *    Spark. Here right rows are bucketed at the band width and left rows
  *    probe their (at most two) overlapping buckets: an equi-join on
  *    (keys, bucket) plus an exact residual filter, so the shuffle is
  *    hash-partitioned and the per-bucket work is bounded by band density,
  *    independent of total history length.
  *
  * Skew note (100 TB): both partition by the equi-key (+ bucket for the
  * band join). A single pathological key (one user with billions of
  * events) serializes in [[asofBackward]]'s window sort; the band join
  * already sub-partitions hot keys by time bucket, and
  * [[asofBackwardChunked]] is the skew-hardened as-of — identical output
  * (equivalence-tested across chunk widths), windows bounded by chunk
  * density, cross-chunk state carried on per-chunk summaries.
  */
object AsOf {

  /** Working-column names the implementations inject via withColumn. A
    * caller frame already owning one of these would be silently
    * overwritten (and the final select(left.columns) would return the
    * corrupted value), so every entry point rejects them up front. */
  private val Reserved = Set(
    "_t", "_side", "_tie", "_pay", "_m", "_m1", "_ck", "_lt", "_rt",
    "_bucket", "_x", "_prev", "_lastp", "_negt", "_negtie")

  private def requireNoReserved(df: DataFrame, side: String): Unit = {
    val clash = df.columns.filter(Reserved.contains)
    require(clash.isEmpty,
      s"$side frame uses reserved as-of working column name(s) " +
        s"${clash.mkString(", ")} — rename them before joining " +
        s"(reserved: ${Reserved.toSeq.sorted.mkString(", ")})")
  }

  /** Backward as-of LEFT join: for each left row, the single right row
    * with the greatest (rightTime, rightTie) such that
    * `right.rightTime <= left.leftTime`, matched within equal `keys`.
    *
    * Emits every left column plus `prefix`-renamed `payload` columns from
    * the matched right row (nulls when no right row precedes). Ties at
    * equal time break by `rightTie` (greatest wins) — deterministic,
    * engine-portable output.
    *
    * Time columns must be mutually comparable (same unit); payload names
    * must not collide with left columns after prefixing. */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String, rightTie: String,
                   payload: Seq[String], prefix: String = "asof_"): DataFrame =
    asofDirected(left, right, keys, leftTime, rightTime, rightTie, payload,
      prefix, forward = false)

  /** Forward as-of LEFT join: the single right row with the SMALLEST
    * (rightTime, rightTie) such that `right.rightTime >= left.leftTime` —
    * "the next reading at or after this event". Same machinery as
    * [[asofBackward]] with the scan direction reversed. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String, rightTie: String,
                  payload: Seq[String], prefix: String = "asof_"): DataFrame =
    asofDirected(left, right, keys, leftTime, rightTime, rightTie, payload,
      prefix, forward = true)

  private def asofDirected(left: DataFrame, right: DataFrame, keys: Seq[String],
                           leftTime: String, rightTime: String, rightTie: String,
                           payload: Seq[String], prefix: String,
                           forward: Boolean): DataFrame = {
    requireNoReserved(left, "left")
    requireNoReserved(right, "right")
    val payStruct = struct(payload.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        timeAsLong(right, rightTime).as("_t"),
        lit(0).as("_side"),
        col(rightTie).cast("long").as("_tie"),
        payStruct.as("_pay")): _*)
    val payType = r.schema("_pay").dataType.asInstanceOf[StructType]
    val l = left
      .withColumn("_t", timeAsLong(left, leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast("long"))
      .withColumn("_pay", lit(null).cast(payType))
    // Backward: ascending time scan, rights before lefts at equal time
    // (_side 0 < 1) so "<=" holds, larger tie later — the running `last`
    // is the greatest (t, tie) <= lt. Forward: time (and tie) DESCENDING,
    // so the running `last` is the smallest (t, tie) >= lt. Either way
    // the UnboundedPreceding frame is computed incrementally — O(1) per
    // row after the sort.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(
        (if (forward) col("_t").desc else col("_t").asc),
        col("_side").asc,
        (if (forward) col("_tie").desc_nulls_first else col("_tie").asc_nulls_first))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_m", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col("_m").getField(p).as(prefix + p)): _*)
  }

  /** Skew-hardened [[asofBackward]]: identical output, but no per-key
    * serialization. A key with billions of rows makes the plain as-of's
    * window partition a single sorted run on one task; here rows are
    * windowed per (key, time-chunk) — bounded by chunk density — and
    * cross-chunk carry-forward happens on per-chunk SUMMARIES (one row
    * per key per chunk with rights), which are orders of magnitude
    * smaller than the raw stream:
    *
    *   1. within-chunk as-of (the plain union+window, partitioned by
    *      (keys, chunk));
    *   2. per-(key, chunk) last-right summary via max(struct(t, tie,
    *      payload)) — a groupBy, no sort;
    *   3. a window over the chunk AXIS (distinct (key, chunk) from both
    *      sides) takes the latest summary strictly before each chunk;
    *   4. unmatched left rows coalesce to their chunk's carried summary.
    *
    * `chunkWidth` is in time units; pick it so one chunk of the hottest
    * key fits a task (e.g. an hour of events). */
  def asofBackwardChunked(left: DataFrame, right: DataFrame, keys: Seq[String],
                          leftTime: String, rightTime: String, rightTie: String,
                          payload: Seq[String], chunkWidth: Long,
                          prefix: String = "asof_"): DataFrame = {
    requireNoReserved(left, "left")
    requireNoReserved(right, "right")
    asofBackwardChunkedImpl(left, right, keys, leftTime, rightTime, rightTie,
      payload, chunkWidth, prefix)
  }

  /** Body of [[asofBackwardChunked]] minus the reserved-name check, so the
    * forward wrapper can inject its own (reserved) working columns. */
  private def asofBackwardChunkedImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                                      leftTime: String, rightTime: String, rightTie: String,
                                      payload: Seq[String], chunkWidth: Long,
                                      prefix: String): DataFrame = {
    require(chunkWidth > 0, s"chunkWidth must be positive: $chunkWidth")
    val keyCols = keys.map(col)
    val payStruct = struct(payload.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        timeAsLong(right, rightTime).as("_t"),
        lit(0).as("_side"),
        col(rightTie).cast("long").as("_tie"),
        payStruct.as("_pay")): _*)
      .withColumn("_ck", floorDiv("_t", 0L, chunkWidth))
    val payType = r.schema("_pay").dataType.asInstanceOf[StructType]
    val l = left
      .withColumn("_t", timeAsLong(left, leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast("long"))
      .withColumn("_pay", lit(null).cast(payType))
      .withColumn("_ck", floorDiv("_t", 0L, chunkWidth))

    // 1. within-chunk running match (same ordering contract as the plain
    // as-of, partition bounded by chunk density, never by key volume)
    val wChunk = Window.partitionBy((keyCols :+ col("_ck")): _*)
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inChunk = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_m1", last(col("_pay"), ignoreNulls = true).over(wChunk))
      .filter(col("_side") === 1)

    // 2. last right per (key, chunk): argmax payload by (t, tie). max_by
    // keeps the payload OUT of the ordering, so unorderable payload types
    // (maps) work here exactly as in the plain path; with duplicate
    // (t, tie) rights the pick is arbitrary in both paths — (time, tie)
    // should uniquely identify right rows for deterministic output
    val summaries = r.groupBy((keyCols :+ col("_ck")): _*)
      .agg(max_by(col("_pay"), struct(col("_t"), col("_tie"))).as("_lastp"))

    // 3. carry the latest summary STRICTLY before each chunk along the
    // chunk axis (axis includes right-less left chunks, so every left row
    // finds its carry row)
    val axis = l.select((keyCols :+ col("_ck")): _*).distinct()
      .unionByName(summaries.select((keyCols :+ col("_ck")): _*))
      .distinct()
    val wAxis = Window.partitionBy(keyCols: _*).orderBy(col("_ck").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = axis
      .join(summaries, keys :+ "_ck", "left")
      .withColumn("_prev", last(col("_lastp"), ignoreNulls = true).over(wAxis))
      .select((keyCols :+ col("_ck") :+ col("_prev").as("_x")): _*)

    // 4. resolve: in-chunk match wins (it is later by construction)
    inChunk
      .join(carried, keys :+ "_ck", "left")
      .withColumn("_m", coalesce(col("_m1"), col("_x")))
      .select(left.columns.map(col) ++
        payload.map(p => col("_m").getField(p).as(prefix + p)): _*)
  }

  /** Skew-hardened [[asofForward]]: forward as-of on (t, tie) IS backward
    * as-of on (-t, -tie) — the greatest negated key at or before -lt is
    * the smallest original key at or after lt — so this is a thin wrapper
    * over [[asofBackwardChunked]] with both orderings negated (time
    * converted to long first; the µs-timestamp rule applies before
    * negation). Identical output to the plain forward join,
    * equivalence-tested across chunk widths. */
  def asofForwardChunked(left: DataFrame, right: DataFrame, keys: Seq[String],
                         leftTime: String, rightTime: String, rightTie: String,
                         payload: Seq[String], chunkWidth: Long,
                         prefix: String = "asof_"): DataFrame = {
    requireNoReserved(left, "left")
    requireNoReserved(right, "right")
    val l2 = left.withColumn("_negt", -timeAsLong(left, leftTime))
    val r2 = right
      .withColumn("_negt", -timeAsLong(right, rightTime))
      .withColumn("_negtie", -col(rightTie).cast("long"))
    asofBackwardChunkedImpl(l2, r2, keys, "_negt", "_negt", "_negtie",
        payload, chunkWidth, prefix)
      .drop("_negt")
  }

  /** Time-band (range) INNER join: all (left, right) pairs with equal
    * `keys` and `right.rightTime` in `[left.leftTime + lower,
    * left.leftTime + upper]` (units of the time columns; lower <= upper).
    *
    * Right rows land in one `width = upper - lower` bucket; each left row
    * probes its two candidate buckets via equi-join, and the exact BETWEEN
    * filters the residue. Emits all left columns plus `prefix`-renamed
    * right `payload` columns. */
  def bandJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               lower: Long, upper: Long,
               payload: Seq[String], prefix: String = "band_"): DataFrame = {
    require(lower <= upper, s"empty band: [$lower, $upper]")
    requireNoReserved(left, "left")
    requireNoReserved(right, "right")
    val width = math.max(upper - lower, 1L)
    val r = right.select(
      keys.map(col) ++ Seq(
        timeAsLong(right, rightTime).as("_rt"),
        struct(payload.map(col): _*).as("_pay")): _*)
      .withColumn("_bucket", floorDiv("_rt", 0L, width))
    // a width-sized band starting at lt+lower overlaps exactly the buckets
    // of its two endpoints (they differ by at most 1)
    val l = left
      .withColumn("_lt", timeAsLong(left, leftTime))
      .withColumn("_bucket", explode(array_distinct(array(
        floorDiv("_lt", lower, width),
        floorDiv("_lt", upper, width)))))
    l.join(r, keys :+ "_bucket")
      .filter(col("_rt").between(col("_lt") + lower, col("_lt") + upper))
      .select(left.columns.map(col) ++
        payload.map(p => col("_pay").getField(p).as(prefix + p)): _*)
  }

  /** Time column → long. A bare cast('long') on TimestampType truncates
    * to whole SECONDS — a right row 850 ms in the future would match a
    * backward as-of — so timestamps convert via unix_micros (µs). Longs
    * and other numerics pass through the cast; the caller owns unit
    * agreement between the two sides (timestamps are always µs). */
  private def timeAsLong(df: DataFrame, c: String) =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
      case t @ (org.apache.spark.sql.types.TimestampNTZType |
                org.apache.spark.sql.types.DateType) =>
        throw new IllegalArgumentException(
          s"convert $c ($t) to TimestampType or an epoch long first")
      case _ => col(c).cast("long")
    }

  /** floor((col + off) / d) in pure LONG arithmetic. SQL DIV truncates
    * toward zero (mis-buckets negative times, so adjust by the remainder
    * sign); float division is NOT an option — ns-epoch values exceed
    * 2^53 and a double quotient mis-buckets edge rows. */
  private[ops] def floorDiv(c: String, off: Long, d: Long) = expr(
    s"""CASE WHEN (($c + $off) % $d) < 0 THEN (($c + $off) DIV $d) - 1
             ELSE ($c + $off) DIV $d END""")
}
