package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the block storage behind a `localCheckpoint`ed Dataset.
  *
  * A localCheckpoint persists its materialized RDD (MEMORY_AND_DISK) and
  * truncates lineage; the blocks are only reclaimed when the RDD object is
  * garbage-collected AND the async ContextCleaner gets around to it. An
  * iterative operator that checkpoints every round therefore leaves a
  * round's worth of dead blocks per iteration for the cleaner to chase —
  * on a long-lived session (a real cluster, or a many-query benchmark
  * JVM) that accumulation squeezes the unified memory pool and degrades
  * every query that follows. Operators instead free each round's blocks
  * deterministically the moment the next round is materialized.
  *
  * DANGER: after [[unpersist]] the Dataset can never be executed again —
  * its lineage was truncated at the checkpoint, so there is nothing to
  * recompute from. Only call it on frames that are provably dead (a
  * superseded iteration round, or loop inputs after the final round has
  * been EAGERLY materialized).
  */
object CheckpointBridge {
  /** Drop the checkpoint blocks of `ds` (no-op on a non-checkpointed
    * plan). Non-blocking: the removal message is async, like RDD.unpersist
    * default. */
  def unpersist(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }
      .foreach(_.unpersist(blocking = false))
}
