package graft

import graft.functions.VectorOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The FuseCosine optimizer rule must rewrite the hand-written HOF
  * cosine pattern to the codegen'd cosine_sim — visibly in the optimized
  * plan, invisibly in the results (incl. NaN on zero vectors). */
class FuseCosineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark // Tables.configure installs the rule
  import spark.implicits._

  /** Unguarded cosine as a user would write it directly. */
  private def handCosine(a: Column, b: Column): Column =
    VectorOps.dot(a, b) / (VectorOps.norm(a) * VectorOps.norm(b))

  test("hand-written HOF cosine is rewritten to cosine_sim in the optimized plan") {
    // range source: not constant-foldable, so the optimized plan keeps
    // the expression visible instead of collapsing to a LocalRelation.
    val df = spark.range(8)
      .select(
        array(col("id").cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), col("id").cast("double")).as("b"))
      .select(handCosine(col("a"), col("b")).as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosine_sim"), optimized)
    assert(!optimized.contains("zip_with"), optimized)
  }

  test("rewritten plan returns bit-identical results to a manual fold") {
    val r = new Random(2)
    val rows = Seq.fill(200)((
      Seq.fill(16)(r.nextDouble() - 0.5), Seq.fill(16)(r.nextDouble() - 0.5)))
    val fused = rows.toDF("a", "b")
      .select(handCosine(col("a"), col("b")).as("c"))
      .as[Double].collect().toSeq
    val manual = rows.map { case (a, b) =>
      val dot = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      dot / (math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x)) *
        math.sqrt(b.foldLeft(0.0)((s, x) => s + x * x)))
    }
    assert(fused == manual)
  }

  test("zero-vector semantics of the replaced ANSI divide are preserved (error)") {
    // Under Spark 4's default ANSI mode a raw divide-by-zero THROWS; the
    // fused expression must throw the same error, not soften it to NULL.
    val ex = intercept[Exception] {
      Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
        .select(handCosine(col("a"), col("b")).as("c"))
        .as[Double].head()
    }
    assert(ex.getMessage.contains("DIVIDE_BY_ZERO") ||
      Option(ex.getCause).exists(_.getMessage.contains("DIVIDE_BY_ZERO")), ex.toString)
  }

  test("unrelated divisions are left untouched (safe no-op)") {
    val df = Seq((4.0, 2.0)).toDF("x", "y").select((col("x") / col("y")).as("d"))
    assert(df.as[Double].head() == 2.0)
    assert(!df.queryExecution.optimizedPlan.toString.contains("cosine_sim"))
  }
}
