package graft

import graft.functions.VectorOps
import graft.plans.CosineSim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The codegen'd cosine expression must be BIT-IDENTICAL to the HOF
  * reference fold (same sequential accumulation) — that equality is what
  * lets q26/q30/q31/q41/q42 swap it in without touching their oracles. */
class CosineSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bit-identical to the HOF cosine on seeded random vectors") {
    val r = new Random(7)
    val rows = Seq.fill(500)((
      Seq.fill(64)(r.nextDouble() * 2 - 1),
      Seq.fill(64)(r.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b").select(
      CosineSim(col("a"), col("b")).as("expr"),
      VectorOps.cosine(col("a"), col("b")).as("hof"))
    val diffs = df.filter(col("expr") =!= col("hof")).count()
    assert(diffs == 0)
  }

  test("null on zero vectors and null inputs") {
    val df = Seq(
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 2.0))),
      (None, Some(Seq(1.0, 2.0))))
      .toDF("a", "b").select(CosineSim(col("a"), col("b")).as("c"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("ragged lengths and null elements yield NULL, same as the HOF fold") {
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0), Some(3.0))), Some(Seq(Some(1.0), Some(2.0)))), // ragged
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))))                 // null elem
      .toDF("a", "b").select(
        CosineSim(col("a"), col("b")).as("expr"),
        VectorOps.cosine(col("a"), col("b")).as("hof"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0), r)
      assert(r.isNullAt(1), r) // the HOF agrees — that's the contract
    }
  }

  test("known values") {
    val got = Seq((Seq(3.0, 4.0), Seq(3.0, 4.0)))
      .toDF("a", "b").select(CosineSim(col("a"), col("b")).as("c"))
      .as[Double].head()
    assert(math.abs(got - 1.0) < 1e-15)
  }

  test("registered as a SQL function (the extensions/injectFunction path)") {
    // Tables.configure (run by TestSpark) installs the same descriptor
    // GraftExtensions injects via spark.sql.extensions.
    val got = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 5.0D)) AS c")
      .as[Double].head()
    assert(got == 0.0)
  }

  test("rides WholeStageCodegen (no interpreted fallback in the plan)") {
    val df = spark.range(100)
      .select(
        array(col("id").cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), col("id").cast("double")).as("b"))
      .select(CosineSim(col("a"), col("b")).as("c"))
    // The "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage in the executed plan's string form.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*("), plan)
    assert(df.count() == 100) // and the generated code actually runs
  }
}
