package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** T6 + J2 at ingest: STREAM-STATIC enrichment — the standard "decorate
  * events with reference data as they arrive" pattern (reference analog:
  * joining each ERCOT page against the static settlement-point metadata
  * before storage). The static side joins per micro-batch with NO
  * streaming state: Spark plans it as an ordinary broadcast-hash join
  * inside every batch, so the operator is stateless, needs no watermark,
  * and scales exactly like its batch counterpart — the dimension is
  * broadcast once per batch, the stream side never shuffles.
  */
object StreamEnrich {

  /** One AvailableNow catch-up: drain `srcDir`, inner-join each
    * micro-batch against broadcast `dim` on `key`, append the projected
    * `outputCols` to `targetDir`. `maxFilesPerTrigger` bounds batch size
    * (T4 throughput ceiling), proving the enrich is correct across
    * batch boundaries, not just within one. */
  def runAvailableNow(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      dim: DataFrame,
      key: String,
      outputCols: Seq[String],
      targetDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {

    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(srcDir)

    val query = stream
      .join(broadcast(dim), key)
      .selectExpr(outputCols: _*)
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
