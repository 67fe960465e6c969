package graft

import graft.pipeline.{DailySummary, VectorStore}
import graft.sinks.JdbcSink
import graft.streaming.StreamingVectorStore
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming → JDBC vector store: multi-batch drain lands every summary
  * exactly once in effect, and a full redelivery (fresh checkpoint, same
  * source — the at-least-once worst case) leaves the table unchanged. */
class StreamingVectorStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("multi-batch drain upserts every day once; full redelivery is a no-op") {
    val url = JdbcSink.memoryUrl("graft_vstore_stream")
    val table = "document_embeddings"
    val base = Files.createTempDirectory("graft_vstore_stream").toFile.getAbsolutePath
    val src = s"$base/src"
    val summaries = DailySummary.run(spark, "/root/testdata/sf0.001").localCheckpoint()
    val n = summaries.count()
    // 5 files, 2 per trigger → 3 micro-batches; rows (whole days) are
    // the atomic unit, so any file split is a valid batch boundary.
    summaries.repartition(5).write.parquet(src)
    val schema = spark.read.parquet(src).schema
    StreamingVectorStore.runAvailableNow(spark, src, schema, url, table,
      s"$base/ckpt1", maxFilesPerTrigger = Some(2))
    val afterFirst = VectorStore.load(spark, url, table).localCheckpoint()
    assert(afterFirst.count() == n)
    // Redelivery: a NEW checkpoint replays the entire source (the
    // at-least-once worst case). The keyed upsert absorbs it.
    StreamingVectorStore.runAvailableNow(spark, src, schema, url, table,
      s"$base/ckpt2", maxFilesPerTrigger = Some(2))
    val afterReplay = VectorStore.load(spark, url, table)
    assert(afterReplay.count() == n)
    assert(afterReplay.exceptAll(afterFirst).isEmpty &&
      afterFirst.exceptAll(afterReplay).isEmpty)
    // And the stored days are exactly the pipeline's days.
    val want = summaries.select(col("vector_id")).orderBy("vector_id")
      .collect().map(_.getString(0)).toSeq
    val got = afterReplay.select(col("vector_id")).orderBy("vector_id")
      .collect().map(_.getString(0)).toSeq
    assert(got == want)
  }
}
