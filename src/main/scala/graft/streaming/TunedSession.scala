package graft.streaming

import org.apache.spark.sql.SparkSession

/** Per-run session tuning shared by the streaming runners.
  *
  * The stateful operators shard their state store by
  * `spark.sql.shuffle.partitions` AT FIRST RUN (the layout is then
  * pinned in the checkpoint). Each shard pays per-batch store
  * open/commit file ops, so the count should track the DATA, not the
  * session default — a catch-up over one day of files doesn't want
  * hundreds of near-empty stores, a 100 TB backfill wants many.
  *
  * `noDataBatches = false` skips the trailing EMPTY micro-batch an
  * AvailableNow drain otherwise runs after the last file. Safe to
  * disable ONLY when the caller does not rely on post-drain eviction
  * emissions: the watermark never ADVANCES in a no-data batch (it
  * moves on data), so an inner join / dedup / update-mode aggregate
  * loses nothing, and a left-outer drain that finalizes its tail with
  * flush DELIVERIES (q94) gets its eviction scan inside those data
  * batches. A left-outer caller without flush traffic must keep the
  * default: its last real batch's watermark gain is applied by exactly
  * that empty batch.
  *
  * Overrides run on a CLONED session so the caller's conf is untouched;
  * with neither override the caller's session is used as-is. */
private[streaming] object TunedSession {
  def apply(spark: SparkSession, statePartitions: Option[Int],
      noDataBatches: Boolean): SparkSession =
    if (statePartitions.isEmpty && noDataBatches) spark
    else {
      val s = spark.newSession()
      statePartitions.foreach(n => s.conf.set("spark.sql.shuffle.partitions", n))
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noDataBatches)
      s
    }
}
