package org.apache.spark

/** Test-only bridge into `private[spark]` surface. `LiveListenerBus
  * .waitUntilEmpty(long)` is public but the `sc.listenerBus` accessor
  * is package-private — this is the same trick Spark's own test
  * helpers use, and it replaces the sleep-and-poll drains the metric
  * specs used before (round-14 ADVICE: a loaded machine can stall
  * task-end delivery past any fixed polling window; the bus's own
  * drain cannot race itself). */
object GraftTestHooks {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(120000L)
}
