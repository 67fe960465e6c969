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

  test("K1/T2 upsert keeps untouched date partitions' files identical (surgical rewrite)") {
    val dir = tmp("graft_surgical") + "/t"
    // Three date partitions, written through the real merge path.
    val b0 = Seq(
      ("2024-01-01", "a", 1L), ("2024-01-01", "b", 2L),
      ("2024-01-02", "a", 10L),
      ("2024-01-03", "c", 5L)).toDF("d", "k", "v")
    graft.streaming.StreamingUpsert.upsertBatch(b0, dir, Seq("d", "k"), "d", 0L)

    // File identity = (name, mtime, length): a rewrite changes all three
    // (part file names carry fresh task UUIDs).
    def files(part: String): Set[(String, Long, Long)] = {
      val d = new java.io.File(s"$dir/d=$part")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified(), f.length())).toSet
    }
    val day1Before = files("2024-01-01")
    val day3Before = files("2024-01-03")
    assert(day1Before.nonEmpty && day3Before.nonEmpty)

    // Merge touches ONLY 2024-01-02: update one key, insert another.
    val b1 = Seq(("2024-01-02", "a", 99L), ("2024-01-02", "z", 7L)).toDF("d", "k", "v")
    graft.streaming.StreamingUpsert.upsertBatch(b1, dir, Seq("d", "k"), "d", 1L)

    // The 100 TB claim (SURVEY §7): untouched partitions are not read,
    // not rewritten — their files are the SAME files, byte for byte.
    assert(files("2024-01-01") == day1Before)
    assert(files("2024-01-03") == day3Before)
    val back = spark.read.parquet(dir)
      .select(col("d").cast("string"), col("k"), col("v"))
      .as[(String, String, Long)].collect().toSet
    assert(back == Set(
      ("2024-01-01", "a", 1L), ("2024-01-01", "b", 2L),
      ("2024-01-02", "a", 99L), ("2024-01-02", "z", 7L),
      ("2024-01-03", "c", 5L)))
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

  test("putBatchedIf: condition rejections counted apart from hard failures (K4 conditional)") {
    // attribute_not_exists-style insert-if-absent against a shared store:
    // duplicate keys lose the condition race (exactly one wins, atomically),
    // the poison row is a hard error.
    SinkOpsSpec.CondStore.m.clear()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (1L, "a-again"), (2L, "b-again"), (4L, "poison"))
      .toDF("id", "payload").repartition(3)
    val stats = SinkOps.putBatchedIf(df, batchSize = 2) { row =>
      val id = row.getLong(0)
      if (row.getString(1) == "poison") throw new RuntimeException("hard error")
      SinkOpsSpec.CondStore.m.putIfAbsent(id, row.getString(1)) == null
    }
    assert(stats.attempted == 6)
    assert(stats.stored == 3)     // ids 1, 2, 3 — first writer each
    assert(stats.condFailed == 2) // the duplicate attempts at ids 1 and 2
    assert(stats.failed == 1)     // the poison row
    assert(SinkOpsSpec.CondStore.m.size() == 3)
  }
}

object SinkOpsSpec {
  /** JVM-static stand-in for the external key-value store — referenced
    * statically from the executor closure, never serialized with it. */
  object CondStore {
    val m = new java.util.concurrent.ConcurrentHashMap[Long, String]()
  }
}
