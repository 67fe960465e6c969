package graft

import graft.plans.SortedIntersectSize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The sorted-merge intersect count must EQUAL size(array_intersect)
  * on sorted inputs — that equality is what lets the dedup verify tier
  * (q28/q81/q84) swap it in without touching any oracle. */
class SortedIntersectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("equals size(array_intersect) on seeded random sorted long arrays") {
    val r = new Random(11)
    // Small value domain → dense overlaps; varying lengths incl. empty.
    val rows = Seq.fill(800)((
      Seq.fill(r.nextInt(40))(r.nextInt(60).toLong).distinct.sorted,
      Seq.fill(r.nextInt(40))(r.nextInt(60).toLong).distinct.sorted))
    val df = rows.toDF("a", "b").select(
      SortedIntersectSize(col("a"), col("b")).as("merge"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.filter(col("merge") =!= col("ref")).count() == 0)
  }

  test("duplicate elements count once (set semantics, like array_intersect)") {
    val df = Seq((Seq(1L, 1L, 2L, 3L, 3L), Seq(1L, 3L, 3L, 4L)))
      .toDF("a", "b")
      .select(SortedIntersectSize(col("a"), col("b")).as("n"))
    assert(df.head().getInt(0) == 2) // {1, 3}
  }

  test("null array yields NULL; empty arrays yield 0") {
    val df = Seq(
      (None, Some(Seq(1L))),
      (Some(Seq.empty[Long]), Some(Seq(1L))),
      (Some(Seq(1L)), Some(Seq.empty[Long])))
      .toDF("a", "b").select(SortedIntersectSize(col("a"), col("b")).as("n"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getInt(0) == 0 && rows(2).getInt(0) == 0)
  }

  test("interpreted eval agrees with codegen") {
    // Forcing the interpreted path: eval() directly on the expression.
    val r = new Random(23)
    for (_ <- 0 until 200) {
      val a = Seq.fill(r.nextInt(30))(r.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(r.nextInt(30))(r.nextInt(40).toLong).distinct.sorted
      val expr = org.apache.spark.sql.catalyst.expressions.Literal.create(
        a, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
      val expr2 = org.apache.spark.sql.catalyst.expressions.Literal.create(
        b, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
      val got = graft.plans.SortedIntersectSize(expr, expr2).eval(null)
      assert(got == a.toSet.intersect(b.toSet).size, s"$a ∩ $b")
    }
  }
}
