package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only seam: deterministic listener-bus drain. QueryExecution
  * listeners (ExecutionListenerBus) ride the shared LiveListenerBus,
  * so waiting until it is empty guarantees every side effect of an
  * already-completed action's listeners (e.g. DeferredUnpersist's
  * unpersist) has run — no fixed-sleep races. Lives in an
  * org.apache.spark subpackage because `SparkContext.listenerBus` is
  * `private[spark]`. */
object ListenerBusSync {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
