package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `private[spark]` bridge (the `ColumnBridge` pattern): exposes the
  * listener-bus drain so benchmark instrumentation can flush in-flight
  * task-metric events BEFORE snapshotting a per-query counter delta.
  * Without the drain, events from query N can land in query N+1's window
  * and shuffle/spill attribution smears across adjacent queries. */
object ListenerBusBridge {

  /** Block until every queued listener event is dispatched (bounded by
    * `timeoutMillis`; a timeout degrades to the undrained behavior rather
    * than failing the run). */
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
