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

  /** documents rebalanced across the cluster for CPU-bound per-row
    * operators (shingling, DOM parsing, language ID, MARC synthesis): the
    * local test files are single-row-group parquet — ONE input split — so
    * a narrow plan would run its whole per-row stage on one core. One
    * cheap shuffle of the raw rows buys full parallelism; on production
    * inputs (thousands of splits) the scan itself provides it and the
    * repartition coalesces away under AQE or can be dropped. */
  def documentsBalanced(s: SparkSession, d: String) =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String) = load(s, d, "embeddings")
}
