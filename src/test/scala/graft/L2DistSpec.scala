package graft

import graft.functions.VectorOps
import graft.plans.L2Dist
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The codegen'd L2 expression must be BIT-IDENTICAL to the HOF
  * reference fold (same sequential accumulation) — that equality is what
  * lets every argmin assignment scan (q42/q65/q67/q79/q88/q89/q93/q99/
  * q100) swap it in without touching its oracle. */
class L2DistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bit-identical to the HOF l2 on seeded random vectors") {
    val r = new Random(11)
    val rows = Seq.fill(500)((
      Seq.fill(64)(r.nextDouble() * 2 - 1),
      Seq.fill(64)(r.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b").select(
      L2Dist(col("a"), col("b")).as("expr"),
      VectorOps.l2Hof(col("a"), col("b")).as("hof"))
    val diffs = df.filter(col("expr") =!= col("hof")).count()
    assert(diffs == 0)
  }

  test("null inputs yield NULL; empty arrays yield 0.0, same as the fold") {
    val rows = Seq(
      (None, Some(Seq(1.0, 2.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])))
    val got = rows.toDF("a", "b")
      .select(L2Dist(col("a"), col("b")).as("d")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getDouble(0) == 0.0)
  }

  test("ragged lengths and null elements yield NULL, same as the HOF fold") {
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0), Some(3.0))), Some(Seq(Some(1.0), Some(2.0)))), // ragged
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))))                 // null elem
      .toDF("a", "b").select(
        L2Dist(col("a"), col("b")).as("expr"),
        VectorOps.l2Hof(col("a"), col("b")).as("hof"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0), r)
      assert(r.isNullAt(1), r) // the HOF agrees — that's the contract
    }
  }

  test("known values") {
    val got = Seq((Seq(1.0, 2.0), Seq(4.0, 6.0)))
      .toDF("a", "b").select(L2Dist(col("a"), col("b")).as("d"))
      .as[Double].head()
    assert(got == 5.0)
  }
}
