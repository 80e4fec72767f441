package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located-join pattern for 100 TB fact
  * tables (SURVEY.md "Partitioning & shuffle"): write both sides bucketed
  * by the join key once, and every subsequent equi-join on that key runs
  * shuffle-free (no Exchange on either side), turning the repeated
  * lineitem⋈orders class of query from two large shuffles per run into
  * zero. The write pays one shuffle; every read amortizes it.
  */
object Bucketing {

  /** Persist a frame as a bucketed (and optionally sorted) table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys — planner note: with
    * equal bucket counts this is exchange-free on both sides. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
