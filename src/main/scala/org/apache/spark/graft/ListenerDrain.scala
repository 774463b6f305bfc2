package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Narrow bridge to `SparkContext.listenerBus` (`private[spark]`):
  * deterministically drain the async listener bus so a metrics listener's
  * buffer is complete before it is read. Same pattern as
  * [[org.apache.spark.sql.graft.Bridge]] — lives under
  * `org.apache.spark` for access, keeps to this one call; everything
  * else in the library uses public Spark APIs only.
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
