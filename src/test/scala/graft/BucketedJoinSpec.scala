package graft

import graft.sinks.SinkOps
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located join claim of SinkOps.writeBucketed, asserted on the
  * actual physical plan: joining two tables bucketed on the join key
  * must plan WITHOUT a shuffle exchange on either side, while the same
  * join from plain parquet shuffles both. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val base = TestSpark.spark

  test("same-key bucketed tables join with no exchange; plain parquet shuffles") {
    val s = base.newSession()
    Tables.configure(s)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val root = Files.createTempDirectory("graft_bucketed").toFile.getAbsolutePath

    val ev = Tables.load(s, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_type"), col("value"))
    val totals = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

    SinkOps.writeBucketed(ev, "ev_bucketed", s"$root/ev", "user_id", 8)
    SinkOps.writeBucketed(totals, "totals_bucketed", s"$root/totals", "user_id", 8)
    try {
      val joined = s.table("ev_bucketed").join(s.table("totals_bucketed"), "user_id")
      val n = joined.count()
      assert(n == ev.count()) // every event row enriched exactly once
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange"), // co-located: pre-shuffled at write time
        plan.take(4000))

      // Control: the identical join from unbucketed parquet MUST shuffle.
      ev.write.mode("overwrite").parquet(s"$root/ev_plain")
      totals.write.mode("overwrite").parquet(s"$root/totals_plain")
      val plain = s.read.parquet(s"$root/ev_plain")
        .join(s.read.parquet(s"$root/totals_plain"), "user_id")
      plain.count()
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      s.sql("DROP TABLE IF EXISTS ev_bucketed")
      s.sql("DROP TABLE IF EXISTS totals_bucketed")
    }
  }
}
