package graft

import graft.sinks.SinkOps
import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The partition-layout claim of SinkOps.writePartitioned, asserted on
  * the actual scan: a date-equality query over a date-partitioned table
  * must read ONLY the matching partition directory (partition pruning at
  * planning time), not scan-then-filter — at 100 TB that is the
  * difference between touching one day and touching three years. The
  * same predicate over unpartitioned parquet reads every file.
  */
class PartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Leaf parquet scans with (#partitions read, #data filters). */
  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }

  test("date-equality over a partitioned table prunes to one partition") {
    val root = Files.createTempDirectory("graft_prune").toFile.getAbsolutePath
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
    SinkOps.writePartitioned(ev, s"$root/by_day", Seq("day"))
    val nDays = ev.select("day").distinct().count()
    assert(nDays > 1, "testdata must span multiple days for this spec to bite")

    val pruned = spark.read.parquet(s"$root/by_day")
      .filter(col("day") === lit("2024-01-03").cast("date"))
    // The rows come back right…
    val expected = ev.filter(col("day") === lit("2024-01-03").cast("date")).count()
    assert(pruned.count() == expected)
    // …and the executed scan proves pruning: the partition filter is in
    // the scan's planning-time metadata, and the post-run numFiles
    // metric shows only the one matching directory was read (the table
    // holds nDays single-file partitions).
    val scan = scans(pruned).head
    assert(scan.metadata.get("PartitionFilters").exists(_.contains("day")),
      s"no partition filter in scan metadata: ${scan.metadata}")
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead < nDays,
      s"pruned scan read $filesRead files — expected fewer than the $nDays partitions")
  }

  test("the same predicate over unpartitioned parquet cannot prune") {
    val root = Files.createTempDirectory("graft_noprune").toFile.getAbsolutePath
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
    // Multiple files, none partition-keyed: every file must be read.
    ev.repartition(4).write.mode("overwrite").parquet(s"$root/flat")
    val flat = spark.read.parquet(s"$root/flat")
      .filter(col("day") === lit("2024-01-03").cast("date"))
    val scan = scans(flat).head
    assert(scan.relation.partitionSchema.isEmpty)
    assert(scan.relation.location.inputFiles.length == 4,
      "unpartitioned layout reads all files")
  }
}
