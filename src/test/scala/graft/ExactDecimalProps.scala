package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the decimal-exact aggregation MODEL (SURVEY.md
  * §5.3): the fixed-point representation used by [[graft.functions.Exact]]
  * is associative/commutative — the property that makes Spark's
  * partial+final aggregation order-independent and therefore
  * hash-comparable against DuckDB. (Pure model — no SparkSession; the
  * Spark-side law is pinned by AggLawsSpec.) */
object ExactDecimalProps extends Properties("ExactDecimal") {

  private val Scale = 6
  private def toFixed(d: Double): BigDecimal =
    BigDecimal(d).setScale(Scale, BigDecimal.RoundingMode.HALF_UP)

  // 2-decimal metric-like doubles, the testdata's value domain.
  private val metric: Gen[Double] =
    Gen.chooseNum(-500000L, 500000L).map(_ / 100.0)

  private val metrics: Gen[List[Double]] = Gen.listOf(metric)

  property("fixed-point sum is permutation-invariant") =
    Prop.forAll(metrics) { xs =>
      val a = xs.map(toFixed).sum
      val b = scala.util.Random.shuffle(xs).map(toFixed).sum
      a == b
    }

  property("fixed-point sum is partition-invariant (partial+final combine)") =
    Prop.forAll(metrics, Gen.chooseNum(1, 8)) { (xs, nParts) =>
      val whole = xs.map(toFixed).sum
      val partials = xs.grouped(math.max(1, xs.size / nParts + 1))
        .map(_.map(toFixed).sum).toList.sum
      whole == partials
    }

  property("2-decimal inputs are represented exactly (no quantization drift)") =
    Prop.forAll(metric) { x =>
      toFixed(x).toDouble == x
    }

  property("mean = sum/count matches the sequential running mean within an ulp-free rational check") =
    Prop.forAll(Gen.nonEmptyListOf(metric)) { xs =>
      val exact = xs.map(toFixed).sum / xs.size
      val viaCounts = xs.map(toFixed).foldLeft(BigDecimal(0))(_ + _) / xs.size
      exact == viaCounts
    }

  property("two-moment variance is partition-invariant (Exact.dvar model)") =
    Prop.forAll(metrics.suchThat(_.size >= 2), Gen.chooseNum(1, 8)) { (xs, nParts) =>
      // Both moments as exact decimals (x² of a 2-decimal value has 4
      // decimals — exact at scale 6), combined across any partitioning.
      def moments(ys: List[Double]): (BigDecimal, BigDecimal) =
        (ys.map(toFixed).sum, ys.map(y => toFixed(y) * toFixed(y)).sum)
      val (sx, sxx) = moments(xs)
      val parts = xs.grouped(math.max(1, xs.size / nParts + 1)).map(moments).toList
      val (psx, psxx) = parts.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      val shuffled = moments(scala.util.Random.shuffle(xs))
      sx == psx && sxx == psxx && shuffled == ((sx, sxx))
    }
}
