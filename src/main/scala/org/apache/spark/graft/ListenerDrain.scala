package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`, so the one legitimate
  * consumer outside Spark — deterministic per-query task-metric
  * accounting in `graft.Bench`, which must see every task's metrics
  * folded in before snapshotting — reaches it through this bridge
  * (same pattern as the native expressions under
  * org.apache.spark.sql.graft).
  */
object ListenerDrain {
  /** Block until all queued listener events are dispatched (bounded).
    * Returns false if the bus failed to empty within the bound — a
    * mis-drained snapshot can misattribute one query's task metrics to
    * the next, so callers comparing before/after deltas should treat a
    * false return as an unreliable measurement, and the warning makes
    * the condition visible in the bench log either way.
    */
  def drain(sc: SparkContext): Boolean =
    try { sc.listenerBus.waitUntilEmpty(30000L); true }
    catch {
      case _: java.util.concurrent.TimeoutException =>
        System.err.println(
          "[bench] WARNING: listener bus failed to drain in 30s; " +
            "task-metric deltas around this point may be misattributed")
        false
    }
}
