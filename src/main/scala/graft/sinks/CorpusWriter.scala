package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-aware curated-corpus writer — the terminal step of a training-data
  * pipeline (filter → dedup → decontaminate → sample → WRITE). At 100 TB
  * the write layout decides whether every downstream read is cheap or
  * ruined, and the two classic failure modes are both small-files bugs:
  *
  *  - `df.write.partitionBy(cols)` with hash-random task placement makes
  *    every task write one file PER partition value it holds — T tasks × P
  *    values files, each tiny. The fix is repartitioning BY the partition
  *    columns first, so each value's rows co-locate in few tasks.
  *  - one giant file per partition value (repartition alone) caps read
  *    parallelism at P. The fix is `maxRecordsPerFile`, which rolls files
  *    at a bound without an extra shuffle.
  *
  * Both fixes compose here; within-file ordering is optionally clustered
  * (`sortWithinPartitions`) for run-length/dictionary compression and
  * min-max skipping on read.
  */
object CorpusWriter {

  /** Write `df` as parquet partitioned by `partitionCols` (e.g. split,
    * lang), with at most `maxRecordsPerFile` rows per file and
    * `tasksPerPartitionValue` writing tasks per partition value.
    *
    * The shuffle key is (partition values, salt < tasksPerPartitionValue):
    * one shuffle total, each output directory receives exactly
    * `tasksPerPartitionValue` writer tasks regardless of corpus skew, and
    * file sizes stay inside [.., maxRecordsPerFile]. `clusterBy` sorts rows
    * inside each writer task (a local sort, no extra shuffle) so the
    * parquet row groups carry tight min-max stats on those columns.
    */
  def writeCurated(df: DataFrame, path: String,
                   partitionCols: Seq[String],
                   maxRecordsPerFile: Long = 1000000L,
                   tasksPerPartitionValue: Int = 4,
                   clusterBy: Seq[Column] = Nil): Unit =
    writeLayout(df, path, partitionCols, maxRecordsPerFile,
      tasksPerPartitionValue, clusterBy, mode = "overwrite")

  /** The one copy of the salt/repartition step (pmod, not abs%:
    * xxhash64 can yield Long.MinValue, whose abs is itself negative) —
    * shared by every writer here so a salting fix applies everywhere.
    * The `_salt` column is still attached; callers drop it after any
    * within-partition sort they need. */
  private def saltedByPartitions(df: DataFrame, partitionCols: Seq[String],
                                 tasksPerPartitionValue: Int): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col).toSeq: _*),
      lit(tasksPerPartitionValue.toLong)).as("_salt")
    df.withColumn("_salt", salt)
      .repartition((partitionCols.map(col) :+ col("_salt")): _*)
  }

  /** The one copy of the parquet layout discipline, shared by overwrite
    * and append so a fix to either (salting, sort contract) applies to
    * both. */
  private def writeLayout(df: DataFrame, path: String,
                          partitionCols: Seq[String],
                          maxRecordsPerFile: Long,
                          tasksPerPartitionValue: Int,
                          clusterBy: Seq[Column],
                          mode: String): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val salted = saltedByPartitions(df, partitionCols, tasksPerPartitionValue)
    // partition cols lead the sort: the file writer requires rows ordered
    // by partition columns within each task and would otherwise insert its
    // own (clusterBy-destroying) sort; a sort it finds already satisfied
    // is skipped and the clusterBy suffix survives into the files
    val clustered =
      if (clusterBy.isEmpty) salted
      else salted.sortWithinPartitions(partitionCols.map(col) ++ clusterBy: _*)
    clustered.drop("_salt")
      .write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Append `df` into an existing [[writeCurated]] layout — the standing-
    * corpus update step of incremental curation. Same shuffle/layout
    * discipline (bounded writer tasks per partition value,
    * maxRecordsPerFile rolling); mode("append") adds files without
    * touching existing ones, so the standing corpus grows by exactly the
    * increment. Callers should pass an already-materialized frame (e.g.
    * re-read the increment just written) so the append never re-executes
    * a curation DAG. */
  def appendCurated(df: DataFrame, path: String,
                    partitionCols: Seq[String],
                    maxRecordsPerFile: Long = 1000000L,
                    tasksPerPartitionValue: Int = 4,
                    clusterBy: Seq[Column] = Nil): Unit =
    writeLayout(df, path, partitionCols, maxRecordsPerFile,
      tasksPerPartitionValue, clusterBy, mode = "append")

  /** Compact an unpartitioned frame to ~`targetFileCount` parquet files of
    * balanced size — the "finalize a shard" step after a filter has left
    * ragged partitions. Round-robin repartition balances rows exactly;
    * `maxRecordsPerFile` still bounds stragglers. */
  def writeCompacted(df: DataFrame, path: String, targetFileCount: Int,
                     maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartition(targetFileCount)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Export as JSON-Lines — the lingua franca LM trainers ingest (one
    * JSON object per line, gzip-compressed shards). Same layout
    * discipline as [[writeCurated]]: repartition by the partition
    * columns + bounded salt so skew can't concentrate writers,
    * `maxRecordsPerFile` rolls shards without an extra shuffle. Shards
    * are splittable-by-line after decompression; use `compression =
    * "none"` when the training loader wants byte-range reads. */
  def writeJsonl(df: DataFrame, path: String,
                 partitionCols: Seq[String] = Nil,
                 maxRecordsPerFile: Long = 1000000L,
                 tasksPerPartitionValue: Int = 4,
                 compression: String = "gzip"): Unit = {
    val writer =
      if (partitionCols.isEmpty)
        df.write
      else
        saltedByPartitions(df, partitionCols, tasksPerPartitionValue)
          .drop("_salt")
          .write.partitionBy(partitionCols: _*)
    writer.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", compression)
      .json(path)
  }
}
