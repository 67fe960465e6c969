package org.apache.spark

/** Bridge into `private[spark]` SparkContext internals for the bench
  * harness (same pattern as org.apache.spark.sql.GraftSql): draining
  * the async listener bus so per-query metric snapshots don't bleed
  * across queries. No logic lives here. */
object GraftSpark {
  def drainListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
