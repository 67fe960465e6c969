package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Vector-algebra laws for the similarity queries (q26/q30/q31). */
class VectorOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pair(a: Seq[Double], b: Seq[Double]) =
    Seq((a, b)).toDF("a", "b")

  test("dot, norm, l2 on known vectors") {
    val df = pair(Seq(1.0, 2.0, 3.0), Seq(4.0, -5.0, 6.0))
    val row = df.select(
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.norm(col("a")).as("na"),
      VectorOps.l2(col("a"), col("b")).as("l")).head()
    assert(row.getDouble(0) == 1.0 * 4 - 2 * 5 + 3 * 6) // 12
    assert(math.abs(row.getDouble(1) - math.sqrt(14)) < 1e-12)
    assert(math.abs(row.getDouble(2) - math.sqrt(9 + 49 + 9)) < 1e-12)
  }

  test("cosine: self = 1, orthogonal = 0, antiparallel = -1") {
    val rows = Seq(
      (Seq(3.0, 4.0), Seq(3.0, 4.0), 1.0),
      (Seq(1.0, 0.0), Seq(0.0, 7.0), 0.0),
      (Seq(2.0, -1.0), Seq(-4.0, 2.0), -1.0))
    for ((a, b, want) <- rows) {
      val got = pair(a, b)
        .select(VectorOps.cosine(col("a"), col("b")).as("c"))
        .as[Double].head()
      assert(math.abs(got - want) < 1e-12, s"$a · $b")
    }
  }

  test("cosine is null-safe on zero vectors (no division blow-up)") {
    val got = pair(Seq(0.0, 0.0), Seq(1.0, 2.0))
      .select(VectorOps.cosine(col("a"), col("b")).as("c"))
      .collect().head
    assert(got.isNullAt(0))
  }

  test("cosine6 rounds to 6 decimals — the cross-engine-stable contract") {
    val got = pair(Seq(1.0, 1.0), Seq(1.0, 0.0))
      .select(VectorOps.cosine6(col("a"), col("b")).as("c"))
      .as[Double].head()
    assert(got == 0.707107) // 1/√2 rounded half-up at 6dp
  }

  test("asDouble casts float arrays exactly (F14)") {
    val df = Seq(Seq(1.5f, -2.25f)).toDF("f")
      .select(VectorOps.asDouble(col("f")).as("d"))
    assert(df.as[Seq[Double]].head() == Seq(1.5, -2.25))
    assert(df.schema("d").dataType.simpleString == "array<double>")
  }
}
