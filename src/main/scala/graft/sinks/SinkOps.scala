package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.util.LongAccumulator

/** Batch sink family (SURVEY.md §2.2 K2/K4/K5), modeled on durable
  * columnar storage instead of JDBC/DynamoDB connections:
  *
  *  - K2 batch insert → partitioned parquet write. Partitioning by a
  *    date-like column + DYNAMIC partition overwrite is the 100 TB
  *    upsert story: an incremental batch rewrites only the partitions
  *    it touches, never the whole table.
  *  - K4 batched puts with per-item error accounting → foreachPartition
  *    in fixed-size batches with Spark accumulators for ok/failed
  *    counts (reference: 25-item DynamoDB batches + per-item error
  *    list, src/storage/dynamodb.py:175-228).
  *  - K5 DDL with column comments → StructField.withComment metadata
  *    that survives the parquet round-trip (reference:
  *    create_weather_table.py:51-82 COMMENT ON statements).
  */
object SinkOps {

  /** K5: the hourly-weather sink schema, comments included (mirrors
    * create_weather_table.py:51-63 — timestamp PK + per-city REAL
    * columns + derived averages). */
  def weatherSchema: StructType = StructType(Seq(
    StructField("timestamp", org.apache.spark.sql.types.TimestampType, nullable = false)
      .withComment("Hour-start timestamp (PK in the reference DDL)"),
    StructField("austin_temp_c", org.apache.spark.sql.types.FloatType)
      .withComment("Austin hourly temperature, Celsius"),
    StructField("houston_temp_c", org.apache.spark.sql.types.FloatType)
      .withComment("Houston hourly temperature, Celsius"),
    StructField("dallas_temp_c", org.apache.spark.sql.types.FloatType)
      .withComment("Dallas hourly temperature, Celsius"),
    StructField("avg_temperature_c", org.apache.spark.sql.types.FloatType)
      .withComment("Row mean across city columns, Celsius"),
    StructField("avg_temperature_f", org.apache.spark.sql.types.FloatType)
      .withComment("avg_temperature_c * 9/5 + 32")))

  /** Existence probe that works on ANY Hadoop-supported filesystem
    * (local, HDFS, S3A, ...). A `java.io.File` probe only sees the
    * local FS and silently reports false elsewhere — which would make
    * the streaming mergers below drop the existing table on a real
    * cluster. Resolved through the session Hadoop conf so scheme,
    * credentials and defaultFS all apply. */
  def pathExists(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    path.getFileSystem(spark.sessionState.newHadoopConf()).exists(path)
  }

  /** K2: write a frame as parquet partitioned by `partitionCols`, with
    * dynamic partition overwrite — re-writing a batch replaces exactly
    * the partitions present in `df` and leaves the rest of the table
    * untouched (the scalable MERGE restatement). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** K2 at co-location: write `df` as a BUCKETED, per-bucket-sorted
    * table on `key`. Two tables bucketed the same way (same key, same
    * bucket count) equi-join and aggregate on that key with NO exchange
    * on either side — the pre-shuffle is paid once at write time, every
    * downstream join reads co-located buckets. This is the 100 TB
    * repeated-join story (SURVEY §4): at that scale the exchange this
    * removes is the dominant cost of every fact-fact join.
    * External table: data lands at `path`, metadata in the session
    * catalog under `name`. */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)

  /** Z-value (Morton code) of two non-negative int columns: the bits of
    * `a` and `b` interleaved, so points close in BOTH dimensions are
    * close on the 1-D curve. Pure integer shift/mask arithmetic —
    * codegen'd, no UDF. `bits` per dimension (values must fit). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Multi-dimensional data SKIPPING layout: order the table along the
    * Z-curve of (`colA`, `colB`) before writing, so each output file
    * covers a small RECTANGLE of the 2-D key space instead of a slab.
    * A single-column sort makes file-level min/max stats selective in
    * that column only — a predicate on the other column still touches
    * every file. Z-ordering makes BOTH columns' per-file ranges narrow,
    * so a 2-D predicate box intersects few files (this is what
    * Delta/Iceberg Z-ORDER does; at 100 TB, file skipping off footer
    * stats is the difference between scanning terabytes and gigabytes).
    * The curve column is dropped before write — it exists only to drive
    * the range partitioner and the in-file sort. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      files: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** The single-column control layout for [[writeZOrdered]]'s skipping
    * comparison: range-sorted by one column only. */
  def writeRangeSorted(df: DataFrame, path: String, c: String, files: Int): Unit =
    df.repartitionByRange(files, col(c))
      .sortWithinPartitions(c)
      .write.mode("overwrite").parquet(path)

  /** Result of a [[putBatched]] run: rows attempted / stored / failed. */
  final case class PutStats(attempted: Long, stored: Long, failed: Long)

  /** Thrown by a batch `put` that landed SOME rows before giving up, so
    * [[putBatched]] accounts the drained rows as stored instead of
    * misstating the whole batch as failed (a multi-round BatchWriteItem
    * drain can store 24 of 25 rows and then exhaust its budget on the
    * last one). */
  final class PartialBatchFailure(val storedRows: Int, message: String,
      cause: Throwable = null) extends RuntimeException(message, cause)

  /** K4: drive a row-level put sink in fixed-size batches per partition,
    * accounting every item as stored or failed (a throwing `put` fails
    * its whole batch, like an errored BatchWriteItem page). Distributes
    * as one pass over the frame; the accumulators are the only
    * driver-side state. */
  /** Result of a [[putBatchedIf]] run: `condFailed` counts items the
    * store REJECTED because their write condition did not hold — a
    * normal outcome, accounted separately from hard errors. */
  final case class CondPutStats(attempted: Long, stored: Long, condFailed: Long, failed: Long)

  /** K4 conditional flavor (reference dynamodb.py:143-165: `put_item`
    * with an optional ConditionExpression, ConditionalCheckFailed
    * counted apart from other ClientErrors): per-item conditional puts,
    * batched per partition. `putIf` returns false when the store's
    * condition (e.g. attribute_not_exists) rejected the item; throwing
    * marks a hard failure. One pass over the frame, accumulators only. */
  def putBatchedIf(df: DataFrame, batchSize: Int)(putIf: Row => Boolean): CondPutStats = {
    val spark = df.sparkSession
    val attempted = spark.sparkContext.longAccumulator("condput_attempted")
    val stored = spark.sparkContext.longAccumulator("condput_stored")
    val condFailed = spark.sparkContext.longAccumulator("condput_cond_failed")
    val failed = spark.sparkContext.longAccumulator("condput_failed")
    df.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(batchSize).foreach { batch =>
        batch.foreach { row =>
          attempted.add(1)
          try { if (putIf(row)) stored.add(1) else condFailed.add(1) }
          catch { case _: Exception => failed.add(1) }
        }
      }
    }
    CondPutStats(attempted.value, stored.value, condFailed.value, failed.value)
  }

  def putBatched(df: DataFrame, batchSize: Int)(put: Seq[Row] => Unit): PutStats = {
    val spark = df.sparkSession
    val attempted: LongAccumulator = spark.sparkContext.longAccumulator("put_attempted")
    val stored: LongAccumulator = spark.sparkContext.longAccumulator("put_stored")
    val failed: LongAccumulator = spark.sparkContext.longAccumulator("put_failed")
    df.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(batchSize).foreach { batch =>
        attempted.add(batch.size)
        try { put(batch); stored.add(batch.size) }
        catch {
          case p: PartialBatchFailure =>
            stored.add(p.storedRows); failed.add(batch.size - p.storedRows)
          case _: Exception => failed.add(batch.size)
        }
      }
    }
    PutStats(attempted.value, stored.value, failed.value)
  }
}
