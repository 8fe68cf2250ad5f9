package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into Spark's package-private listener bus: the bench harness
  * drains pending task-end events before reading its per-query metric
  * accumulators, so a query's tasks are never attributed to the next
  * query's diagnostics line.
  */
object ListenerFlush {
  def flush(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty() catch { case _: Throwable => () }
}
