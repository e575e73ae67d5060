package org.apache.spark

/** Bridge into `private[spark]` scheduler internals used by the bench
  * harness: draining the listener bus makes per-query task-metric
  * attribution exact (listener events are delivered asynchronously, so
  * without a drain the last tasks' bytes could land on the next
  * query's counters). Same access-path convention as GraftSql.
  */
object GraftSpark {
  def drainListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
