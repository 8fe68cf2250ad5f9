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

  /** Unpersist the checkpoint RDD directly under `ds`'s plan.
    *
    * OWNERSHIP CONTRACT: call this only on a dataset whose checkpoint
    * RDD no live dataset still needs — a local checkpoint's lineage is
    * truncated, so a released checkpoint is gone, not lazily
    * recomputable, and a sibling still reading it fails with missing
    * blocks. The CC fixpoint loops satisfy this by construction (each
    * round's checkpoint has exactly one reader, the next round, which is
    * eagerly materialized before the release).
    *
    * SAFETY VALVE (r7 advisor): the release fires only when the plan
    * holds EXACTLY ONE LogicalRDD — the shape every legitimate call site
    * has (a dataset that IS a checkpoint, possibly under a Project). A
    * plan embedding several checkpoints means the caller passed a
    * composite (e.g. a caller-checkpointed edge set joined in), where a
    * blanket unpersist would irrecoverably drop a still-live sibling's
    * blocks; refusing to act degrades to the pre-release behavior (blocks
    * freed by the ContextCleaner at the next driver GC) instead of
    * corrupting it.
    *
    * No-op for plans without a LogicalRDD; non-fatal errors are
    * swallowed (releasing storage is an optimization), fatal ones
    * (OOM, interrupts) propagate.
    */
  def release(ds: Dataset[_]): Unit =
    try {
      val rdds = ds.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }
      if (rdds.size == 1) rdds.head.unpersist(blocking = false)
    } catch { case scala.util.control.NonFatal(_) => () }
}
