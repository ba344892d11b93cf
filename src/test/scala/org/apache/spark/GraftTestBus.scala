package org.apache.spark

/** Test-only bridge to the `private[spark]` listener bus: lets specs
  * drain queued events deterministically before attaching a counting
  * listener (the async bus delivers queued events to listeners attached
  * at drain time, so a sleep is a race, not a barrier).
  */
object GraftTestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
