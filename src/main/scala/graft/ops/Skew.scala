package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md "Partitioning & shuffle";
  * charter technique list). AQE's skew-join splitting already handles
  * sort-merge joins at runtime; salting covers the cases AQE can't:
  * broadcast-ineligible joins against a replicable side, and aggregations
  * whose per-key state is large (collect_list/set-union style), where one
  * hot key otherwise serializes on a single task.
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a deterministic salt
    * in [0, salts); the small side is replicated `salts` times; the join
    * runs on (key, salt), spreading each hot key over `salts` tasks.
    * Result equals `large.join(small, key)` exactly — replication only
    * multiplies the SMALL side (salts × |small| rows through the shuffle). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = large.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(typedlit((0 until salts).toArray)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation for skewed group keys with heavy
    * per-key state: phase 1 aggregates on (key, salt) — each hot key's
    * state builds on `salts` tasks — phase 2 merges the partials per key.
    * `partial` runs within a salt cell, `merge` combines cells.
    * (Sum/count-style aggs don't need this: Spark's map-side partial
    * aggregation already bounds them; use it for collect_set/list-shaped
    * state.) */
  def saltedAgg(df: DataFrame, key: String,
                partial: Column => Column, partialOut: String,
                merge: Column => Column, mergedOut: String,
                valueCol: String, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(partial(col(valueCol)).as(partialOut))
      .groupBy(col(key))
      .agg(merge(col(partialOut)).as(mergedOut))
  }

  /** Convenience: skew-safe distinct-values-per-key (collect_set shape). */
  def saltedCollectSet(df: DataFrame, key: String, valueCol: String,
                       salts: Int = 16): DataFrame =
    saltedAgg(df, key,
      partial = collect_set, partialOut = "_partial",
      merge = c => array_distinct(flatten(collect_list(c))), mergedOut = "values",
      valueCol = valueCol, salts = salts)
}
