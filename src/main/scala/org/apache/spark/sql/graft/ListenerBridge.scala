package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** `private[spark]` escape hatch for the bench harness: flush the async
  * listener bus so a per-query Spark-job counter reads the jobs of THE
  * query that just finished, not a tail of its predecessor's events.
  * Lives under `org.apache.spark` purely for the access modifier, like
  * [[ColumnBridge]].
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
