package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `SparkContext.listenerBus` (private[spark]) for the
  * bench harness: streaming-progress events are delivered
  * asynchronously, so the per-query trigger telemetry must flush the
  * bus before draining its capture queue or it races the delivery
  * thread. (The test twin lives in `org.apache.spark.grafttest`.)
  */
object ListenerBusBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
