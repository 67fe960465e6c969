package graft

import org.scalatest.funsuite.AnyFunSuite

/** q51's scale claim, asserted: adaptive execution must SPLIT the skewed
  * shuffle partition of the unsalted hot-key join at runtime.
  *
  * The registered query runs correct under any thresholds (the oracle
  * checks values, not plans); this spec runs the same query fn in a
  * session whose AQE skew thresholds are scaled to the test data —
  * production keeps the defaults (256 MB threshold), which are the same
  * thresholds a genuinely hot 100 TB key blows through. */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val base = TestSpark.spark

  test("AQE splits the hot partition of the unsalted skew join (skew=true in final plan)") {
    // Sibling session: same SparkContext, isolated SQLConf.
    val s = base.newSession()
    Tables.configure(s)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    // Scale the detection thresholds to sf0.01 the way the 256 MB
    // defaults relate to real shuffle sizes; factor 1.2 vs default 5.0
    // because the non-hot partitions here are near-empty.
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")

    val df = SparkEntry.queries("q51_aqe_skew_join")(s, "/root/testdata/sf0.01")
    val rows = df.collect()
    assert(rows.length > 1)

    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(2000))
    // OptimizeSkewedJoin marks the join (skew=true) and reads the hot
    // partition through a skewed AQEShuffleRead.
    assert(plan.contains("skew=true"), plan.take(4000))

    // And the values must be untouched by the split: hot key 0 carries
    // 90% of events (event_id % 10 in 0..8).
    val n = rows.map(r => r.getAs[Long]("n")).sum
    val hot = rows.find(_.getAs[String]("label") == "grp_0").get.getAs[Long]("n")
    assert(hot >= (n * 0.85).toLong, s"hot=$hot total=$n")
  }
}
