package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets filter
  * pushdown + column pruning on the scan for free; never cache here —
  * callers decide lifetime.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)    = load(s, d, "region")
  def nation(s: SparkSession, d: String)    = load(s, d, "nation")
  def customer(s: SparkSession, d: String)  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = load(s, d, "supplier")
  def part(s: SparkSession, d: String)      = load(s, d, "part")
  def orders(s: SparkSession, d: String)    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String)    = load(s, d, "events")
  def documents(s: SparkSession, d: String) = load(s, d, "documents")

  /** documents rebalanced for CPU-bound per-row operators (shingling, DOM
    * parsing, language ID): the local test files are single-row-group
    * parquet — ONE non-empty input split — so a narrow plan would run its
    * whole per-row stage on one core. Use this ONLY where the per-row work
    * dominates the shuffle cost; cheap map-only queries should read
    * [[documents]] directly. */
  def documentsBalanced(s: SparkSession, d: String): DataFrame =
    balanced(s, documents(s, d))

  /** Repartition `df` only when its scan yields far fewer splits than the
    * cluster has cores — i.e. the input genuinely lacks parallelism (few
    * files / few row groups). Production inputs with thousands of splits
    * pass through untouched: an explicit `repartition(n)` is a real
    * shuffle that AQE does NOT remove, so it must never be baked in
    * unconditionally. */
  def balanced(s: SparkSession, df: DataFrame): DataFrame = {
    val splits = df.rdd.getNumPartitions
    val target = s.sparkContext.defaultParallelism
    if (splits * 4 <= target) df.repartition(target) else df
  }

  def embeddings(s: SparkSession, d: String) = load(s, d, "embeddings")
}
