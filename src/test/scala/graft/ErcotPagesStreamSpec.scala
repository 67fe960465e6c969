package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The paginated feed as a FIRST-CLASS streaming source: checkpointed
  * page offsets give exactly-once delivery (the Spark-native form of
  * the reference's windowed overlap-reprocessing loop, main.py:341-369).
  * Admission control caps pages per micro-batch, and a restart resumes
  * from the checkpoint even though the feed object is brand new. */
class ErcotPagesStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("readStream over the feed: pagesPerTrigger pages per micro-batch, all rows exactly once") {
    val q = spark.readStream.format("ercot-pages")
      .option("pages", 6).option("pageSize", 20)
      .option("startDate", "2024-01-01")
      .option("pagesPerTrigger", 2)
      .load()
      .writeStream.format("memory").queryName("pages_stream")
      .option("checkpointLocation", tmp("pages_stream_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("pages_stream").collect()
      assert(rows.length == 6 * 20)
      assert(rows.map(_.toString).distinct.length == 120, "duplicate delivery")
      // 6 pages at 2 per trigger = 3 data batches
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches == 3, s"expected 3 admission-capped batches, saw $dataBatches")
      assert(q.recentProgress.filter(_.numInputRows > 0).forall(_.numInputRows == 40))
    } finally q.stop()
  }

  test("restart resumes from the checkpointed page offset: a grown feed delivers only the new pages") {
    val ckpt = tmp("pages_restart_ckpt")
    val out = tmp("pages_restart_out")
    def run(pages: Int): Unit = {
      val q = spark.readStream.format("ercot-pages")
        .option("pages", pages).option("pageSize", 20)
        .option("startDate", "2024-01-01")
        .option("pagesPerTrigger", 3)
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      try { q.awaitTermination() } finally q.stop()
    }
    run(pages = 4) // first deployment: 4 published pages
    assert(spark.read.parquet(out).count() == 4 * 20)
    run(pages = 6) // the feed grew; the checkpoint knows 4 pages are done
    val all = spark.read.parquet(out)
    assert(all.count() == 6 * 20, "restart must deliver ONLY pages 4-5")
    // exactly-once: every (ts, settlement_point) key appears once
    assert(all.select("ts", "settlement_point").distinct().count() == 6 * 20)
  }
}
