package graft

import graft.sinks.SinkOps
import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DYNAMIC partition pruning — the runtime companion to
  * PartitionPruneSpec's static case: when the pruning predicate only
  * exists on the DIMENSION side of a join (here "which days are
  * flagged"), Spark must still prune the partitioned fact scan, by
  * pushing the dim's build-side keys into the scan as a runtime
  * subquery filter. At 100 TB this is what keeps "join facts to this
  * month's dimension rows" from scanning three years of fact
  * partitions.
  */
class DynamicPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Full traversal: AQE roots and materialized query stages are leaf
    * wrappers that `collect` will not descend into. */
  private def all(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: all(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: all(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r +: all(r.child)
    case other => other +: other.children.flatMap(all)
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    all(p).collect { case s: FileSourceScanExec => s }

  test("a dim-side filter prunes the partitioned fact scan at runtime") {
    // DPP's cost heuristic compares the pruning benefit against the
    // fact size; KB-scale test tables fail it, so pin the heuristic the
    // way a production-sized fact passes it (production-shaped confs on
    // a throwaway session, like AqeSkewJoinSpec does for skew).
    val s = spark.newSession()
    Tables.configure(s)
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "100.0")
    val root = Files.createTempDirectory("graft_dpp").toFile.getAbsolutePath
    val ev = Tables.load(s, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
    SinkOps.writePartitioned(ev, s"$root/fact", Seq("day"))
    val nDays = ev.select("day").distinct().count()
    assert(nDays > 1)

    // The filter lives ONLY on the dim: the fact query has no literal
    // day predicate to push statically.
    // DPP requires a LIKELY-SELECTIVE predicate on the dim (EqualTo on
    // a literal qualifies; a bare boolean attribute does not).
    val dim = ev.select(col("day")).distinct()
      .withColumn("label",
        when(col("day") === lit("2024-01-03").cast("date"), "hot").otherwise("cold"))
    dim.write.parquet(s"$root/dim")

    val fact = s.read.parquet(s"$root/fact")
    val joined = fact
      .join(broadcast(s.read.parquet(s"$root/dim").filter(col("label") === "hot")), "day")
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    val rows = joined.collect()
    assert(rows.length == 1, s"expected 1 flagged day, got ${rows.length}")
    assert(rows.head.getAs[Long]("n") ==
      ev.filter(col("day") === lit("2024-01-03").cast("date")).count())

    // The fact scan carries the runtime pruning subquery.
    val factScan = scans(joined.queryExecution.executedPlan)
      .find(_.relation.partitionSchema.nonEmpty)
      .getOrElse(fail("no partitioned scan in the plan"))
    assert(factScan.partitionFilters.exists(_.toString.contains("dynamicpruning")),
      s"no dynamic pruning filter on the fact scan: ${factScan.partitionFilters}")
  }
}
