package org.apache.spark.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the checkpoint RDD behind a locally-checkpointed Dataset.
  *
  * `Dataset.localCheckpoint` truncates lineage by wrapping the
  * materialized RDD in a `LogicalRDD`; the RDD's MEMORY_AND_DISK blocks
  * are only released when the ContextCleaner notices the RDD is
  * unreachable — i.e. after a driver GC. An iterative fixpoint loop
  * (connected components) that checkpoints every round therefore leaks
  * every superseded round's blocks for as long as the driver heap stays
  * comfortable (with a pinned, pre-touched heap that is effectively
  * forever), and back-to-back CC queries in one session stall each
  * other's tasks on storage eviction. Releasing a superseded checkpoint
  * the moment its successor is materialized keeps the loop's storage
  * footprint at O(1) rounds instead of O(rounds).
  */
object CheckpointRelease {

  /** Unpersist the checkpoint RDD(s) directly under `ds`'s plan.
    * No-op for plans that contain no LogicalRDD (never throws: releasing
    * storage is an optimization, not a correctness step).
    */
  def release(ds: Dataset[_]): Unit =
    try {
      ds.queryExecution.analyzed.foreach {
        case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    } catch { case _: Throwable => () }
}
