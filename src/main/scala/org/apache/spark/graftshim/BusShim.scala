package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Listener-bus flush for metric snapshots (lives under o.a.s to see
  * the private[spark] bus — the same minimal-bridge pattern as
  * sql.graftshim.GraftShim). Spark delivers listener events
  * asynchronously; a bench that reads its accumulators right after an
  * action would race the queue and attribute one query's shuffle bytes
  * to the next. `waitUntilEmpty` drains every queue (it's what Spark's
  * own test harness uses between action and assertion). */
object BusShim {
  def flushListeners(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
