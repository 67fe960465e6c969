package graft.streaming

import graft.pipeline.VectorStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming ingest into the REAL JDBC vector store: the reference's
  * incremental loop (fetch a window → summarize → upsert,
  * main.py:341-369) as a Structured Streaming sink. Each micro-batch
  * carries complete summary rows (a row is an atomic day — the unit the
  * reference recomputes and re-upserts), so ANY batch boundary is safe,
  * and [[VectorStore.store]]'s update-else-insert makes redelivery
  * idempotent: at-least-once processing + idempotent keyed upsert =
  * exactly-once EFFECT on the table, the same contract
  * StreamingUpsert proves on parquet (T2) — here against a live
  * connection.
  */
object StreamingVectorStore {

  /** Drain `srcDir` (parquet summary rows) into the store via
    * AvailableNow micro-batches; `maxFilesPerTrigger` shapes the batch
    * cadence like the reference's per-window increments. */
  def runAvailableNow(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      url: String,
      table: String,
      checkpoint: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n)).parquet(srcDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        VectorStore.store(batch, url, table); ()
      }
      .start()
    q.awaitTermination()
  }
}
