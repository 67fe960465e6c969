package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the canonical test tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Roles (SURVEY.md §1/§2): `events` stands in for the reference's SCED
  * telemetry stream (reference: src/main.py:59-93), `embeddings` for the
  * pgvector `document_embeddings` table (reference:
  * src/storage/pgvector_storage.py:89-96), `documents` for the Document
  * model (reference: src/schema/models.py:7-12).
  *
  * At 100 TB these would be partitioned tables (events by date,
  * lineitem/orders by date buckets); here they are single parquet files.
  * All loads go through `spark.read.parquet` so Catalyst predicate
  * pushdown + column pruning apply (SURVEY.md §4).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session-level settings every entry point must apply once at startup
    * (Verify/Bench mains, the flagship `entry`, test builders) — NOT per
    * table load, so no loader mutates shared session state mid-query.
    * nanosAsLong: events.ts is parquet TIMESTAMP(NANOS), which Spark has
    * no native type for; read the raw int64 and truncate to micros (the
    * data is micro-aligned; DuckDB's reader does the same truncation).
    * Also registers graft's custom SQL functions (cosine_sim) — the
    * FunctionRegistry path a `spark.sql.extensions=graft.plans.
    * GraftExtensions` deployment gets automatically. */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.plans.GraftExtensions.install(spark)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      // Kept timezone-naive (NTZ) to match the source's naive semantics.
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
            .cast("timestamp_ntz"))
    case _ => spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Round-robin fan-out applied ONLY when the plan currently reads
    * fewer partitions than the session can run in parallel. The test
    * files are single parquet row groups, so every scan starts as ONE
    * task and compute-heavy stages above it serialize; a production
    * many-file layout already provides the parallelism, making this a
    * structural no-op there. Call it AFTER filters/projections so
    * pushdown still reaches the scan. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Load all tables as a name→DataFrame map. */
  def loadAll(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, sfDir, n)).toMap

  /** Register every table as a temp view for spark.sql use. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
