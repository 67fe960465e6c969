package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Tables.load's events-ts adaptivity, exercised against synthetic
  * parquet files in all three read shapes. The current sandbox only
  * produces one of them (native timestamp_ntz), so without this suite
  * the other two branches are dead code that rots until the NEXT
  * environment flip re-activates one — exactly how round 6 lost 43
  * queries to a stale conversion. Each branch must yield the same
  * canonical frame: ts as micro-precision timestamp_ntz with identical
  * wall-clock values. */
class TablesLoadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // One canonical wall-clock instant, no zone: 2024-03-05 06:07:08.123456.
  private val micros = 1709618828123456L

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_tables_load").toString

  private def loadedTs(dir: String): (DataType, java.time.LocalDateTime) = {
    val df = Tables.load(spark, dir, "events")
    val dt = df.schema("ts").dataType
    val v = df.select(col("ts")).head().get(0).asInstanceOf[java.time.LocalDateTime]
    (dt, v)
  }

  private val expected = java.time.LocalDateTime.of(2024, 3, 5, 6, 7, 8, 123456000)

  test("int64 nanos era: raw longs truncate to micros and land as timestamp_ntz") {
    val dir = tmp()
    // The nanosAsLong read path surfaces the column as plain BIGINT.
    Seq((1L, micros * 1000L + 789L)) // sub-micro tail must truncate away
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (dt, v) = loadedTs(dir)
    assert(dt == TimestampNTZType, s"got $dt")
    assert(v == expected, s"got $v")
  }

  test("native timestamp_ntz era (current sandbox): pass-through") {
    val dir = tmp()
    Seq(Tuple1(1L)).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(micros)).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (dt, v) = loadedTs(dir)
    assert(dt == TimestampNTZType, s"got $dt")
    assert(v == expected, s"got $v")
  }

  test("session-zoned timestamp era: cast to ntz keeps the UTC wall clock") {
    val dir = tmp()
    // Session zone is pinned UTC (TestSpark), so the zoned->naive cast
    // must reproduce the same wall-clock digits.
    Seq(Tuple1(1L)).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(micros)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // Force the reader to surface TimestampType even where the writer
    // recorded an ntz-style file: read with inference off.
    val prev = spark.conf.getOption("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    try {
      val (dt, v) = loadedTs(dir)
      assert(dt == TimestampNTZType, s"got $dt")
      assert(v == expected, s"got $v")
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", p)
      case None => spark.conf.unset("spark.sql.parquet.inferTimestampNTZ.enabled")
    }
  }

  test("spread fans out a single-file scan and leaves a many-file scan alone") {
    val target = spark.sparkContext.defaultParallelism
    // One small file → the file-index estimate is far below the core
    // count, so spread must insert the round-robin repartition.
    val one = tmp()
    spark.range(1000).toDF("id").coalesce(1).write.mode("overwrite").parquet(one)
    val spreadOne = Tables.spread(spark.read.parquet(one).filter(col("id") > 10))
    assert(spreadOne.rdd.getNumPartitions == target,
      "single-file scan should be repartitioned to defaultParallelism")
    // target+ files → the scan already parallelizes; spread must be a
    // structural no-op (no repartition node on top of the scan).
    val many = tmp()
    spark.range(100000).toDF("id").repartition(target + 4)
      .write.mode("overwrite").parquet(many)
    val manyDf = spark.read.parquet(many).filter(col("id") > 10)
    assert(Tables.spread(manyDf) eq manyDf,
      "many-file scan should pass through spread unchanged")
  }

  test("spread counts only the partition-pruned files") {
    // A partitioned table with `target`+ directories, filtered down to
    // ONE partition: the estimate must see the pruned single-file scan
    // (and fan it out), not the unpruned directory listing.
    val target = spark.sparkContext.defaultParallelism
    val dir = tmp()
    spark.range(10000).toDF("id")
      .withColumn("p", col("id") % (target + 4))
      .repartition(col("p"))
      .write.partitionBy("p").mode("overwrite").parquet(dir)
    val pruned = Tables.spread(spark.read.parquet(dir).filter(col("p") === 3))
    assert(pruned.rdd.getNumPartitions == target,
      "pruned-to-one-file scan should be repartitioned to defaultParallelism")
  }
}
