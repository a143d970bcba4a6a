package org.apache.spark

/** Bridge into `private[spark]` scheduler internals: QueryExecutionListener
  * callbacks are delivered on the async listener bus, so stats readers
  * flush the bus before materializing the stats table. */
object GraftSparkBridge {
  def waitForListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
