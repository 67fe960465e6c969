package graft

import graft.pipeline.VectorIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted ANN index's production contract (mirror of
  * DedupIndexSpec for the vector tier): the build is memoized — a
  * second prepare returns the published path without rebuilding — and
  * q100's append plan recomputes exactly ONE assignment (the batch's),
  * reading the corpus's assignments from the index parquet. */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val cells = graft.operators.SimilarityQueries.IvfCells

  test("prepared() memoizes: same path, index files untouched on re-prepare") {
    val p1 = VectorIndex.prepared(spark, dir, cells)
    val listing1 = new java.io.File(p1).listFiles()
      .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    val p2 = VectorIndex.prepared(spark, dir, cells)
    assert(p1 == p2)
    val listing2 = new java.io.File(p2).listFiles()
      .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    assert(listing1 == listing2, "re-prepare rewrote the published index")
    // The index really is the corpus's assignment table.
    val n = spark.read.parquet(p1).count()
    val corpus = Tables.load(spark, dir, "embeddings").count()
    assert(n == corpus, s"index rows $n != corpus $corpus")
  }

  test("q100 plans ONE assignment cross join; the index arrives by parquet scan") {
    val df = SparkEntry.queries("q100_ivf_append")(spark, dir)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // The corpus side must come from the persisted index scan...
    assert(plan.contains("graft_vec_index"),
      s"append plan does not scan the persisted index:\n${plan.take(3000)}")
    // ...and only the BATCH is scored against centroids: exactly one
    // broadcast nested-loop (the centroid crossJoin). A second one
    // would mean the corpus assignment is being recomputed.
    val crossJoins = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(crossJoins == 1,
      s"expected exactly 1 assignment cross join, found $crossJoins")
  }
}
