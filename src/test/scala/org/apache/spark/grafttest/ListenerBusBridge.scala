package org.apache.spark.grafttest

import org.apache.spark.SparkContext

/** Test-only bridge into `SparkContext.listenerBus` (private[spark]):
  * listener-based specs must flush the asynchronous bus before asserting
  * on captured events, or they race the delivery thread.
  */
object ListenerBusBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
