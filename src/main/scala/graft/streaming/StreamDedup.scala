package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** T6 + X3 at ingest: streaming DEDUPLICATION — the dedup-at-the-door a
  * training-data pipeline runs so duplicates never land in storage
  * (batch analogs: q27/q28/q32; reference analog: the idempotent
  * vector_id upsert, pgvector_storage.py:102-105, done before the sink
  * instead of by it).
  *
  * `dropDuplicatesWithinWatermark(key)` keeps one row per key with the
  * state EVICTED once the watermark passes — so state holds only the
  * lateness horizon (2 days here), not the stream's history. Rows
  * arriving behind the watermark are dropped as late, which is exactly
  * the at-most-once-per-key contract re-deliveries need.
  */
object StreamDedup {

  /** One AvailableNow catch-up: drain `srcDir` (optionally in bounded
    * micro-batches so re-delivered files land in LATER batches and the
    * dedup must work across state, not within one batch), keep the
    * first row per `key`, append to `targetDir`. */
  def runAvailableNow(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      key: String,
      targetDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      statePartitions: Option[Int] = None,
      noDataBatches: Boolean = true): Unit = {

    // Dedup emits each first-seen key in the DATA batch that carries
    // it, so a terminating drain can skip the trailing empty batch —
    // rationale and sizing documented once on TunedSession.
    val session = TunedSession(spark, statePartitions, noDataBatches)

    val reader = session.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(srcDir)

    val query = stream
      .withWatermark("ts", "2 days")
      .dropDuplicatesWithinWatermark(key)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", targetDir)
      .start()
    query.awaitTermination()
  }
}
