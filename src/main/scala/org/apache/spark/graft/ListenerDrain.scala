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
  /** Block until all queued listener events are dispatched (bounded). */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(30000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
