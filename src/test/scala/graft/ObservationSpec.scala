package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability without a second pass: `df.observe` attaches
  * aggregate metrics that are computed AS the job runs — at 100 TB the
  * difference between "row counts and sums for the run report" costing
  * zero extra scans versus doubling every stage. The metrics must agree
  * exactly with a separately-computed aggregate (they ride the same
  * exact-decimal expressions the oracle gate uses).
  */
class ObservationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("observed metrics match a direct aggregate, with no extra scan") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val obs = Observation("ingest")
    // The observed frame does real work (a filter + projection), and
    // the metrics piggyback on that single materialization.
    val out = ev.filter(col("value") >= 0)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        graft.functions.Exact.dsum(col("value")).as("sum_value"))
      .select("event_id", "value")
    val materialized = out.count()
    val metrics = obs.get
    assert(metrics("n_rows") == materialized)
    val direct = ev.filter(col("value") >= 0)
      .agg(graft.functions.Exact.dsum(col("value"))).head.getDouble(0)
    assert(metrics("sum_value") == direct,
      s"observed ${metrics("sum_value")} vs direct $direct")
  }
}
