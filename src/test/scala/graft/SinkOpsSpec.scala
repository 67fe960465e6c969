package graft

import graft.sinks.SinkOps
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink family semantics: commented schema round-trip (K5), dynamic
  * partition overwrite (K2), batched puts with error accounting (K4). */
class SinkOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("weatherSchema carries a comment on every column (K5 DDL metadata)") {
    assert(SinkOps.weatherSchema.fields.forall(_.getComment().isDefined))
    assert(SinkOps.weatherSchema.fieldNames.head == "timestamp")
  }

  test("column comments survive a parquet round-trip") {
    val dir = tmp("graft_schema_rt") + "/t"
    val df = spark.createDataFrame(
      java.util.List.of(Row(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        1.0f, 2.0f, 3.0f, 2.0f, 35.6f)),
      SinkOps.weatherSchema)
    df.write.parquet(dir)
    val back = spark.read.parquet(dir).schema
    assert(back("austin_temp_c").getComment().contains("Austin hourly temperature, Celsius"))
  }

  test("dynamic partition overwrite rewrites only the touched partitions (K2)") {
    val dir = tmp("graft_dpo") + "/t"
    val day1 = Seq(("2024-01-01", "a", 1L), ("2024-01-01", "b", 2L))
    val day2v1 = Seq(("2024-01-02", "a", 10L))
    SinkOps.writePartitioned((day1 ++ day2v1).toDF("d", "k", "v"), dir, Seq("d"))
    // Second batch touches ONLY day 2 — day 1 must survive untouched.
    val day2v2 = Seq(("2024-01-02", "a", 99L), ("2024-01-02", "z", 7L))
    SinkOps.writePartitioned(day2v2.toDF("d", "k", "v"), dir, Seq("d"))
    val back = spark.read.parquet(dir)
      .select(col("d").cast("string"), col("k"), col("v"))
      .as[(String, String, Long)].collect().toSet
    assert(back == Set(
      ("2024-01-01", "a", 1L), ("2024-01-01", "b", 2L),
      ("2024-01-02", "a", 99L), ("2024-01-02", "z", 7L)))
  }

  test("putBatched accounts stored vs failed per batch (K4)") {
    val df = (1 to 9).map(i => (i.toLong, s"item$i")).toDF("id", "payload")
      .repartition(1)
    val stats = SinkOps.putBatched(df, batchSize = 3) { batch =>
      if (batch.exists(_.getLong(0) == 5L))
        throw new RuntimeException("poison item in page") // fails its page
    }
    assert(stats.attempted == 9)
    assert(stats.failed == 3)  // exactly the page containing id 5
    assert(stats.stored == 6)
  }

  test("putBatched with no failures stores everything") {
    val df = (1 to 10).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    val stats = SinkOps.putBatched(df, batchSize = 4)(_ => ())
    assert(stats == SinkOps.PutStats(10, 10, 0))
  }
}
