package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** The load-bearing plan-shape claims, asserted on the ACTUAL physical
  * plans (PLANS.md is the human-readable dump; this pins them in CI):
  * ANN assignment runs as aggregates, not ranking windows; dedup
  * candidate generation never degenerates to a nested-loop/cartesian
  * product; small sides the scaladocs claim are broadcast really are.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  /** Collect over the plan INCLUDING inside AQE wrappers. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p.collect { case n => n }
    self.flatMap {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case n => Seq(n)
    }
  }

  test("q42/q65: ANN cell assignment plans with NO ranking window") {
    Seq("q42_ivf_knn", "q65_kmeans_step").foreach { q =>
      assert(!nodes(plan(q)).exists(_.isInstanceOf[WindowExec]),
        s"$q plans a Window — assignment must be an aggregate")
    }
  }

  test("dedup/similarity candidate generation never plans a cross product") {
    Seq("q28_minhash_pairs", "q32_simhash_bands", "q31_embedding_neardup",
      "q59_dup_clusters", "q68_incremental_dedup").foreach { q =>
      val ns = nodes(plan(q))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
        s"$q plans a CartesianProduct")
      assert(!ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        s"$q plans a BroadcastNestedLoopJoin")
    }
  }

  test("claimed broadcasts are real: q60 stats/dfreq, q26 query side") {
    Seq("q60_bm25", "q26_knn_topk").foreach { q =>
      assert(nodes(plan(q)).exists(_.isInstanceOf[BroadcastExchangeExec]),
        s"$q plans no broadcast exchange")
    }
  }
}
