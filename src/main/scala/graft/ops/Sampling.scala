package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment for
  * training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the sample changes with
  * partitioning, task retries, and Spark versions — useless for a held-out
  * split that must stay fixed across reruns of a 100 TB job. These
  * operators key every decision on `md5(key || salt)`, so membership is a
  * pure function of the row key: reproducible across runs, engines
  * (the DuckDB oracle recomputes it byte-for-byte), partitionings, and
  * cluster sizes, and trivially narrow (a filter/projection on the scan —
  * no shuffle, no RNG state).
  *
  * The first 8 hex chars of the digest are compared lexicographically
  * against a threshold — uniform over 16^8 buckets, so `fraction` is
  * honored to ~2.3e-10 granularity. */
object Sampling {

  private def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    val buckets = math.round(fraction * (1L << 32)).min(1L << 32)
    if (buckets >= (1L << 32)) "ffffffffg" // > any 8-hex-digit string
    else f"$buckets%08x"
  }

  /** The hash key: first 8 hex chars of md5(key || salt). */
  def hashKey(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8)

  /** Keep ~`fraction` of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double,
                          salt: String = "graft"): DataFrame =
    df.filter(hashKey(key, salt) < lit(hexThreshold(fraction)))

  /** Stratified deterministic sample: per-stratum keep fractions (strata
    * value → fraction; strata missing from the map are dropped). Same
    * hash-threshold mechanism as [[deterministicSample]], so each
    * stratum's sample nests across fractions and survives repartitioning
    * — rebalancing a skewed corpus (e.g. downsampling a dominant
    * language) without RNG state. */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       fractions: Map[String, Double],
                       salt: String = "graft"): DataFrame = {
    require(fractions.nonEmpty, "at least one stratum fraction required")
    val h = hashKey(key, salt)
    val keep = fractions.foldRight(lit(false): Column) {
      case ((stratum, f), acc) =>
        when(strata === stratum, h < lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Assign each row a split label by key hash: `splits` maps label →
    * fraction (must sum to ~1; the last label absorbs rounding). Order of
    * the Seq defines the hash-range layout, so the same call always yields
    * the same assignment. */
  def splitAssign(key: Column, splits: Seq[(String, Double)],
                  salt: String = "graft"): Column = {
    require(splits.nonEmpty, "at least one split required")
    val h = hashKey(key, salt)
    val cuts = splits.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val labeled = splits.init.map(_._1).zip(cuts.map(hexThreshold))
    labeled.foldRight(lit(splits.last._1): Column) { case ((label, cut), acc) =>
      when(h < lit(cut), lit(label)).otherwise(acc)
    }
  }
}
