package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** T6 + X4+ at ingest: STREAM-SIDE MODEL SCORING — apply a per-row
  * (or per-document) transform to each micro-batch via foreachBatch.
  * The transform runs as an ordinary BATCH plan inside every
  * micro-batch, so anything expressible over one batch (explode +
  * aggregate + window included) is available with NO streaming state:
  * correct whenever each input row is self-contained (a document
  * carries its whole text), which is exactly the q116 scoring shape —
  * the persisted model ships in the transform's closure, batches
  * append independently, and a catch-up over a 100 TB backlog is just
  * more batches of the same stateless plan.
  */
object StreamScore {

  /** One AvailableNow catch-up: drain `srcDir`, apply `transform` to
    * each micro-batch as a batch frame, append the result to
    * `targetDir`. `maxFilesPerTrigger` bounds batch size, proving the
    * transform is correct ACROSS batch boundaries, not just within
    * one (a doc scored in batch 2 must score exactly as it would have
    * in batch 1). */
  def runAvailableNow(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      targetDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None)(
      transform: DataFrame => DataFrame): Unit = {

    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(srcDir)

    val query = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        transform(batch).write.mode("append").parquet(targetDir)
      }
      .start()
    query.awaitTermination()
  }
}
