package graft

import graft.functions.Exact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The aggregation laws behind the whole oracle strategy: [[Exact]]
  * aggregates must equal a sequential collection fold EXACTLY (not
  * approximately), independent of partitioning/accumulation order —
  * that is what makes Spark-vs-DuckDB hash comparison meaningful
  * (SURVEY.md §5.2-5.3). Seeded-random frames, multiple partitionings. */
class AggLawsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2-decimal doubles like the testdata's money/metric columns.
  private def sample(seed: Long, n: Int): Seq[Double] = {
    val r = new Random(seed)
    Seq.fill(n)(math.round(r.nextDouble() * 10000 - 5000) / 100.0)
  }

  private def foldSum(xs: Seq[Double]): Double =
    xs.map(BigDecimal(_).setScale(6)).sum.toDouble

  test("dsum equals the exact BigDecimal fold, for several seeds and sizes") {
    for ((seed, n) <- Seq((1L, 1), (2L, 100), (3L, 997), (42L, 5000))) {
      val xs = sample(seed, n)
      val got = xs.toDF("v").agg(Exact.dsum(col("v"))).as[Double].head()
      assert(got == foldSum(xs), s"seed=$seed n=$n")
    }
  }

  test("dsum is partitioning-invariant: any repartition gives bit-identical sums") {
    val xs = sample(7L, 2000)
    val expected = foldSum(xs)
    for (p <- Seq(1, 3, 8, 32)) {
      val got = xs.toDF("v").repartition(p)
        .agg(Exact.dsum(col("v"))).as[Double].head()
      assert(got == expected, s"partitions=$p")
    }
  }

  test("davg equals exact sum / count, and ignores nulls like the reference") {
    val xs = sample(11L, 500)
    val withNulls = xs.map(Option(_)) ++ Seq.fill(50)(Option.empty[Double])
    val got = withNulls.toDF("v").repartition(5)
      .agg(Exact.davg(col("v"))).as[Double].head()
    assert(got == foldSum(xs) / xs.size)
  }

  test("empty aggregate: dsum/davg are null → COALESCE 0.0 matches main.py:91") {
    val empty = Seq.empty[Double].toDF("v")
    val row = empty.agg(
      coalesce(Exact.dsum(col("v")), lit(0.0)).as("s"),
      coalesce(Exact.davg(col("v")), lit(0.0)).as("a")).head()
    assert(row.getDouble(0) == 0.0 && row.getDouble(1) == 0.0)
  }

  test("max/min/count agree with the collection ops") {
    val xs = sample(13L, 777)
    val row = xs.toDF("v").repartition(6)
      .agg(max(col("v")), min(col("v")), count(col("v"))).head()
    assert(row.getDouble(0) == xs.max)
    assert(row.getDouble(1) == xs.min)
    assert(row.getLong(2) == xs.size)
  }
}
