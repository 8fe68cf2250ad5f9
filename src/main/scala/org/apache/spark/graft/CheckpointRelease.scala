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
    *
    * OWNERSHIP CONTRACT: call this only on a dataset whose checkpoint
    * RDDs no live dataset still needs — a local checkpoint's lineage is
    * truncated, so a released checkpoint is gone, not lazily
    * recomputable, and a sibling still reading it fails with missing
    * blocks. The CC fixpoint loops satisfy this by construction (each
    * round's checkpoint has exactly one reader, the next round, which is
    * eagerly materialized before the release).
    *
    * No-op for plans without a LogicalRDD; non-fatal errors are
    * swallowed (releasing storage is an optimization), fatal ones
    * (OOM, interrupts) propagate.
    */
  def release(ds: Dataset[_]): Unit =
    try {
      ds.queryExecution.analyzed.foreach {
        case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
