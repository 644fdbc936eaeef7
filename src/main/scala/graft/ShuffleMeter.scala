package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Process-wide shuffle byte meter (r12 verdict #6): wall time on a
  * shared box is noisy — r12's committed artifact reported a 0.86 s
  * query at 7.6 s purely from machine load — but shuffle bytes are a
  * DETERMINISTIC property of the executed plan, so recording them per
  * bench key catches plan regressions (a lost broadcast, a new
  * exchange, a fixpoint running extra steps) even under load.
  *
  * Usage: register via `sc.addSparkListener`, snapshot around each
  * query (snapshot flushes the async listener bus through
  * [[org.apache.spark.graftshim.BusShim]] so deltas attribute to the
  * query that just ran, not the next one). Counts every task's
  * shuffle-read total (local + remote) and shuffle-write bytes. */
class ShuffleMeter extends SparkListener {
  private val read = new AtomicLong(0L)
  private val written = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  /** (bytesRead, bytesWritten) so far, after draining the event bus. */
  def snapshot(sc: SparkContext): (Long, Long) = {
    org.apache.spark.graftshim.BusShim.flushListeners(sc)
    (read.get(), written.get())
  }
}
