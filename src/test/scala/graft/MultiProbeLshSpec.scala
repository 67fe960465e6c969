package graft

import org.scalatest.funsuite.AnyFunSuite

/** The multi-probe claim of q30/q41, asserted: probing the Hamming-1
  * ring of a FINER bucketing must beat the single-probe baseline on both
  * axes at once — fewer candidates scored AND more exact-top-k hits
  * recovered. (11 probes of 1024 buckets score ~11/1024 of the corpus vs
  * 1/64 for one 6-bit bucket; recall rises because a near neighbor that
  * flips one leading sign bit stays reachable.) */
class MultiProbeLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("multi-probe: fewer candidates, strictly more recall than single-probe") {
    val rows = SparkEntry.queries("q41_ann_recall")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 20) // one row per query
    val candS = rows.map(_.getAs[Long]("n_cand_single")).sum
    val candM = rows.map(_.getAs[Long]("n_cand_multi")).sum
    val hitsS = rows.map(_.getAs[Long]("n_hits_single")).sum
    val hitsM = rows.map(_.getAs[Long]("n_hits_multi")).sum
    assert(candM <= candS, s"multi-probe candidate budget $candM exceeds single-probe $candS")
    assert(hitsM > hitsS, s"multi-probe recall ($hitsM hits) must strictly beat single-probe ($hitsS)")
  }
}
