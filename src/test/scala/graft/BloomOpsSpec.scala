package graft

import graft.functions.BloomOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Explicit Bloom pre-filter semantics: no false negatives ever (the
  * property the q84 exactness argument rests on), bounded false
  * positives, and prefilter-then-exact-join ≡ exact-join alone. */
class BloomOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every inserted key passes might_contain") {
    val keys = spark.range(0, 5000).select(($"id" * 7919L + 13L).as("h"))
    val bloom = BloomOps.build(keys, "h", estimatedItems = 10000)
    assert(keys.filter(!BloomOps.mightContain(bloom, $"h")).count() == 0)
  }

  test("false positives are bounded: most absent keys are rejected") {
    val keys = spark.range(0, 5000).select(($"id" * 7919L + 13L).as("h"))
    val bloom = BloomOps.build(keys, "h", estimatedItems = 10000)
    // Disjoint probe set (different affine family, offset past the range).
    val absent = spark.range(0, 5000).select(($"id" * 104729L + 1000000007L).as("h"))
    val passed = absent.filter(BloomOps.mightContain(bloom, $"h")).count()
    assert(passed < 500, s"false-positive rate ${passed / 5000.0} is not bloom-like")
  }

  test("prefilter + exact join returns exactly the unfiltered join result") {
    val small = spark.range(0, 300).select(($"id" * 31L).as("h"), $"id".as("s"))
    val big = spark.range(0, 20000).select(($"id" % 1000 * 31L).as("h"), $"id".as("b"))
    val exact = big.join(small, "h").select("h", "s", "b")
    val bloom = BloomOps.build(small, "h", estimatedItems = 1000)
    val prefiltered = big.filter(BloomOps.mightContain(bloom, $"h"))
      .join(small, "h").select("h", "s", "b")
    assert(prefiltered.exceptAll(exact).isEmpty && exact.exceptAll(prefiltered).isEmpty)
  }

  test("the probe is a native expression in the plan, not a UDF") {
    val keys = spark.range(0, 10).select($"id".as("h"))
    val bloom = BloomOps.build(keys, "h", estimatedItems = 100)
    val plan = spark.range(0, 100).select($"id".as("h"))
      .filter(BloomOps.mightContain(bloom, $"h"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }
}
