package org.apache.spark

/** Test-only shim across the `private[spark]` boundary: deterministically
  * drain the async listener bus so job-count assertions need no wall-clock
  * grace windows. */
object GraftTestBridge {
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
