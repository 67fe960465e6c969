package graft

import graft.operators.SimilarityQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q99 scale guard (salt-grid cell cap + CollectTopK partner pick)
  * is RESULT-PRESERVING: a planted mega-cell — every vector argmin-lands
  * in ONE cell, the skew a seeded (untrained) codebook can produce —
  * yields bit-identical drop rows under an aggressively small cap
  * (grid width ≫ 1) as under an effectively-infinite one (grid width 1,
  * the pre-guard plan). VERDICT r5 "What's wrong #1".
  */
class SemanticPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic positive-valued vectors: positive orthant cosines sit
    * well above the 0.3 near-dup threshold, so the planted cell is DENSE
    * with qualifying pairs — the worst case for the pair join. */
  private def vectors(n: Int, dim: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(0.1 + rnd.nextDouble()))
    }.toDF("vec_id", "ev")
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("planted mega-cell: capped grid ≡ uncapped, and the fixture is dense") {
    val base = vectors(48, 6)
    // cells = 1 → a single centroid → EVERY vector assigns to cell 0.
    val uncapped = rows(SimilarityQueries.semanticPrune(base, 1, 1 << 20))
    val capped = rows(SimilarityQueries.semanticPrune(base, 1, 5)) // g = ⌈48/5⌉ = 10
    assert(uncapped.size > 30, s"fixture too sparse to stress the pair join: ${uncapped.size} drops")
    assert(uncapped.forall(_._3 == 0L), "fixture: all drops must come from the planted cell")
    assert(capped == uncapped)
  }

  test("mixed cells: capped grid ≡ uncapped across uneven occupancies") {
    val base = vectors(60, 6)
    val uncapped = rows(SimilarityQueries.semanticPrune(base, 4, 1 << 20))
    val capped = rows(SimilarityQueries.semanticPrune(base, 4, 7))
    assert(uncapped.nonEmpty)
    assert(capped == uncapped)
  }

  test("cap=1 degenerates to one row per grid task and still matches") {
    // The most extreme grid (g = n): every task holds ≤1 row per side.
    val base = vectors(24, 6)
    val uncapped = rows(SimilarityQueries.semanticPrune(base, 1, 1 << 20))
    val capped = rows(SimilarityQueries.semanticPrune(base, 1, 1))
    assert(capped == uncapped)
  }
}
