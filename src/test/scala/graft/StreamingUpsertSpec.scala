package graft

import graft.streaming.StreamingUpsert
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T6: incremental streaming restatement of the reference driver loop
  * (main.py:343-369): two AvailableNow catch-up cycles over a growing
  * source directory must converge to exactly the batch-computed answer,
  * including a late-arriving update to an already-written day. */
class StreamingUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // Integer-valued doubles so streaming/batch double sums are exact.
  private val firstFiles = Seq(
    (ts("2024-01-01 03:00:00"), "click", 10.0),
    (ts("2024-01-01 15:00:00"), "click", 20.0),
    (ts("2024-01-02 08:00:00"), "view", 5.0),
    (ts("2024-01-03 09:00:00"), "click", 7.0))
  private val lateFiles = Seq(
    (ts("2024-01-03 22:00:00"), "click", 100.0), // late rows for day 3
    (ts("2024-01-04 01:00:00"), "view", 42.0),   // and a brand-new day
    (ts("2024-01-04 02:00:00"), "click", 1.0))

  private def toDf(rows: Seq[(Timestamp, String, Double)]): DataFrame =
    rows.toDF("ts", "event_type", "value")

  private def groundTruth(rows: Seq[(Timestamp, String, Double)]) =
    toDf(rows)
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("d").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet

  test("two AvailableNow cycles converge to the batch answer (late data upserted)") {
    val root = Files.createTempDirectory("graft_stream").toFile.getAbsolutePath
    val src = s"$root/src"; val target = s"$root/target"; val ckpt = s"$root/ckpt"
    val schema = toDf(firstFiles).schema

    toDf(firstFiles).write.mode("append").parquet(src)
    StreamingUpsert.runAvailableNow(spark, src, schema, target, ckpt)

    val afterFirst = spark.read.parquet(target)
      .select(col("d").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(afterFirst == groundTruth(firstFiles))

    // New files arrive (incl. late data for day 3); a second catch-up
    // cycle from the same checkpoint processes ONLY the new files but
    // must still re-state day 3 to the full total (state + upsert).
    toDf(lateFiles).write.mode("append").parquet(src)
    StreamingUpsert.runAvailableNow(spark, src, schema, target, ckpt)

    val afterSecond = spark.read.parquet(target)
      .select(col("d").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(afterSecond == groundTruth(firstFiles ++ lateFiles))
  }

  test("upsertBatch alone: newer version wins, untouched dates survive") {
    val root = Files.createTempDirectory("graft_upsert").toFile.getAbsolutePath
    val target = s"$root/t"
    val v1 = Seq(("2024-02-01", "a", 1L, 10.0), ("2024-02-02", "a", 2L, 20.0))
      .toDF("d", "event_type", "n", "sum_value")
    StreamingUpsert.upsertBatch(v1, target, Seq("d", "event_type"), "d", version = 1L)
    val v2 = Seq(("2024-02-02", "a", 5L, 99.0)) // restates only day 2
      .toDF("d", "event_type", "n", "sum_value")
    StreamingUpsert.upsertBatch(v2, target, Seq("d", "event_type"), "d", version = 2L)
    val back = spark.read.parquet(target)
      .select(col("d").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(back == Set(("2024-02-01", "a", 1L, 10.0), ("2024-02-02", "a", 5L, 99.0)))
  }

  test("upsertBatch resolves the target through Hadoop FS (file:-scheme path)") {
    // A java.io.File probe can't see a scheme-qualified URI, would report
    // "absent" and silently drop day 1 on the second upsert.
    val root = Files.createTempDirectory("graft_upsert_uri").toFile.getAbsolutePath
    val target = s"file:$root/t"
    val v1 = Seq(("2024-03-01", "a", 1L, 10.0), ("2024-03-02", "a", 2L, 20.0))
      .toDF("d", "event_type", "n", "sum_value")
    StreamingUpsert.upsertBatch(v1, target, Seq("d", "event_type"), "d", version = 1L)
    val v2 = Seq(("2024-03-02", "a", 5L, 99.0))
      .toDF("d", "event_type", "n", "sum_value")
    StreamingUpsert.upsertBatch(v2, target, Seq("d", "event_type"), "d", version = 2L)
    val back = spark.read.parquet(target)
      .select(col("d").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    // Day 1 must SURVIVE the second, day-2-only batch.
    assert(back == Set(("2024-03-01", "a", 1L, 10.0), ("2024-03-02", "a", 5L, 99.0)))
  }
}
