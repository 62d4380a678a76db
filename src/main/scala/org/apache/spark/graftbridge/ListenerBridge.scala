package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Dev-profiling bridge: `SparkContext.listenerBus` is private[spark],
  * but QueryProf needs to drain it between queries so listener counters
  * attribute to the query that produced them. Declared inside the
  * org.apache.spark package for access — the same documented extension
  * technique as sql.graftbridge.ColumnBridge. Measurement-only; no
  * query path touches this. */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
