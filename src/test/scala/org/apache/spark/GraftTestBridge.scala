package org.apache.spark

/** Test-only bridge into `private[spark]` members (same pattern as
  * org.apache.spark.sql.graftbridge.Bridge for private[sql]): listener
  * events are delivered asynchronously, so metric-asserting tests must
  * drain the bus before reading their accumulators.
  */
object GraftTestBridge {
  def waitListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
