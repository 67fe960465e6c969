package graft

import graft.plans.CollectTopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The custom top-k aggregate must agree exactly with the ranking-window
  * formulation (its semantic reference) under any partitioning — that is
  * what licenses the Q·P·k shuffle-reduction in q26. */
class CollectTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("i"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("g"), col("i"), col("s"), col("rn").cast("long").as("rn"))
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(CollectTopK.topk(col("s"), col("i"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("g"), col("t.vec_id").as("i"), col("t.sim").as("s"),
        (col("pos") + 1).cast("long").as("rn"))

  test("matches the ranking window exactly on seeded random data, any partitioning") {
    val r = new Random(42)
    val rows = Seq.fill(2000)((r.nextInt(7).toString, r.nextLong() % 1000,
      math.round(r.nextDouble() * 1e6) / 1e6))
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.toDF("g", "i", "s").repartition(parts)
      val want = windowTopK(df, 5).collect().map(_.toSeq).toSet
      val got = aggTopK(df, 5).collect().map(_.toSeq).toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("ties on score break on ascending id (the oracle's order)") {
    val df = Seq(("g", 30L, 1.0), ("g", 10L, 1.0), ("g", 20L, 1.0), ("g", 40L, 0.5))
      .toDF("g", "i", "s")
    val got = aggTopK(df, 3).select("i", "rn").as[(Long, Long)].collect().toSeq.sortBy(_._2)
    assert(got == Seq((10L, 1L), (20L, 2L), (30L, 3L)))
  }

  test("groups smaller than k return all their rows, best-first") {
    val df = Seq(("a", 1L, 0.3), ("a", 2L, 0.9)).toDF("g", "i", "s")
    val got = aggTopK(df, 10).select("i", "rn").as[(Long, Long)].collect().toSeq.sortBy(_._2)
    assert(got == Seq((2L, 1L), (1L, 2L)))
  }

  test("null scores are skipped, not ranked") {
    val df = Seq(("a", 1L, Some(0.4)), ("a", 2L, None), ("a", 3L, Some(0.8)))
      .toDF("g", "i", "s")
    val got = aggTopK(df, 5).select("i").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("plans as ObjectHashAggregate with a partial stage (map-side combine)") {
    val df = Seq(("a", 1L, 0.4), ("b", 2L, 0.5)).toDF("g", "i", "s").repartition(2)
    val plan = df.groupBy(col("g"))
      .agg(CollectTopK.topk(col("s"), col("i"), 3).as("tk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_collect_topk") || plan.contains("partial collect_topk")
      || plan.toLowerCase.contains("partial"), plan)
  }
}
