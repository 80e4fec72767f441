package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: downsample an event stream onto a fixed
  * per-key time grid with last-observation-carried-forward gap fill —
  * the feature-engineering step that turns irregular events into the
  * regular sequences models consume (and the classic pandas
  * `resample().ffill()` a Spark user has to hand-roll).
  */
object Resample {

  /** Per (key, step-aligned bucket): event count and the rounded
    * decimal sum of `valueCol`; every key's grid runs from its first to
    * its last occupied bucket with empty buckets LOCF-filled from the
    * previous value (`filled` = 1 marks carried rows; `n` = 0 there).
    * The first bucket per key is occupied by construction, so
    * `v_filled` is total.
    *
    * Scale shape: one (key, bucket) aggregate with map-side combine;
    * bounds per key are a second bounded aggregate; the grid explodes
    * from per-key (lo, hi) — `maxGridPerKey` guards the span/step ratio
    * LOUDLY (raise_error inside the plan), because a mis-chosen step on
    * a long-lived key would otherwise materialize an enormous array.
    * The fill window partitions by key (never global — the registry
    * plan audit enforces this shape everywhere).
    *
    * Determinism: sums are decimal(18,2) before rounding (the q15 money
    * discipline); the grid is integer arithmetic on epoch-µs; LOCF
    * copies already-rounded doubles. */
  def resampleLocf(df: DataFrame, keyCol: String, tsUsCol: String,
                   valueCol: Column, stepUs: Long,
                   maxGridPerKey: Int = 1 << 20): DataFrame = {
    require(stepUs >= 1, s"stepUs must be >= 1: $stepUs")
    require(maxGridPerKey >= 1, s"maxGridPerKey must be >= 1: $maxGridPerKey")
    val bucket = (col(tsUsCol) - (col(tsUsCol) % stepUs)).as("bucket_us")
    val hourly = df
      .select(col(keyCol), bucket,
        valueCol.cast("decimal(18,2)").as("_v"))
      .groupBy(keyCol, "bucket_us")
      .agg(count(lit(1)).as("n"),
        round(sum(col("_v")), 2).cast("double").as("_sum"))
    val parallelism =
      math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    // EXPLICIT numbered round-robin before the explode: the grid fan-out
    // multiplies rows AFTER the bounds exchange, whose byte size (one
    // tiny row per key) AQE's coalescing reads as "one partition is
    // plenty" — serializing the whole explode+join+fill chain (measured
    // 3.4× slower than AQE-off at sf1). A repartition with an explicit
    // count is never coalesced, so the fan-out stays parallel
    val grid = hourly.groupBy(keyCol)
      .agg(min("bucket_us").as("_lo"), max("bucket_us").as("_hi"))
      .repartition(parallelism)
      .select(col(keyCol),
        explode(when(
          ((col("_hi") - col("_lo")) / stepUs) < maxGridPerKey,
          sequence(col("_lo"), col("_hi"), lit(stepUs)))
          .otherwise(raise_error(concat(lit(s"resampleLocf: key "),
            col(keyCol).cast("string"),
            lit(s" spans more than $maxGridPerKey buckets at step $stepUs" +
              " — choose a coarser step or split the key"))))
          ).as("bucket_us"))
    val w = Window.partitionBy(keyCol).orderBy("bucket_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // and an explicit keyed repartition before the fill window, for the
    // same reason: the post-join frame's bytes per row are small enough
    // that byte-based coalescing starves the window of tasks. The window
    // reuses this partitioning (clusterBy key ⊆ hash(key)), so this
    // REPLACES the exchange EnsureRequirements would insert — no extra
    // shuffle vs the AQE-off plan
    grid.join(hourly, Seq(keyCol, "bucket_us"), "left")
      .repartition(parallelism, col(keyCol))
      .select(col(keyCol), col("bucket_us"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("_sum"), last(col("_sum"), ignoreNulls = true).over(w))
          .as("v_filled"),
        col("_sum").isNull.cast("int").as("filled"))
  }
}
