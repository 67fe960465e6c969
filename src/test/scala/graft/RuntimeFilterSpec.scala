package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime BLOOM-FILTER join pruning — the row-level companion to
  * DynamicPruneSpec's partition-level case: when a selective dim filter
  * exists but the fact's join key is NOT a partition column, Spark can
  * still build a bloom filter from the dim's keys and drop fact rows
  * BEFORE the join's shuffle. At 100 TB that converts "shuffle the
  * whole fact to join 2% of it" into "shuffle ~2%". Thresholds are
  * production-scaled, so they're pinned to test scale here (the same
  * pattern AqeSkewJoinSpec and DynamicPruneSpec use).
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val base = TestSpark.spark

  test("a selective dim side injects a bloom filter on the fact scan side") {
    val s = base.newSession()
    Tables.configure(s)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")

    val li = Tables.load(s, "/root/testdata/sf0.01", "lineitem")
    val o = Tables.load(s, "/root/testdata/sf0.01", "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val rows = joined.collect()

    // The fact side carries a might_contain(bloom) filter fed by a
    // bloom_filter_agg over the dim's join keys.
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "no bloom runtime filter on the fact side")
    assert(plan.contains("bloom_filter_agg"), "no bloom filter build on the dim side")

    // And the filter is semantics-preserving (bloom = no false negatives).
    val direct = Tables.load(base, "/root/testdata/sf0.01", "lineitem")
      .join(Tables.load(base, "/root/testdata/sf0.01", "orders")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(rows.map(_.getAs[Long]("n")).sum == direct)
  }
}
