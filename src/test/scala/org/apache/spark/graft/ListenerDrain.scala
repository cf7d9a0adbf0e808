/** Lives under org.apache.spark to reach the private[spark] listener
  * bus — test-only, used to flush pending listener events before
  * asserting on job counts.
  */
package org.apache.spark.graft

import org.apache.spark.SparkContext

object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000L)
}
