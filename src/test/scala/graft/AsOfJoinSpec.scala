package graft

import graft.plans.AsOf
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The as-of join operator's contract: for each left row, the single
  * most recent right row with equal keys and right-ts <= left-ts; NULL
  * enrichment when none exists yet; forward-only per-key semantics
  * across key switches; and the custom physical node actually planning. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 12:00:00"), 110.0),
    ("B", ts("2024-01-01 11:00:00"), 50.0))
    .toDF("sym", "qts", "px")

  private val trades = Seq(
    ("A", ts("2024-01-01 09:00:00"), 1L), // before any quote → null
    ("A", ts("2024-01-01 10:00:00"), 2L), // boundary: ts equality matches
    ("A", ts("2024-01-01 11:59:00"), 3L), // latest at-or-before = 10:00
    ("A", ts("2024-01-01 13:00:00"), 4L), // picks 12:00, not 10:00
    ("B", ts("2024-01-01 10:30:00"), 5L), // B's quote is later → null
    ("B", ts("2024-01-01 23:00:00"), 6L), // B matches B's quote, not A's
    ("C", ts("2024-01-01 12:00:00"), 7L)) // key with no right rows at all
    .toDF("sym", "tts", "id")

  test("most-recent-at-or-before semantics, per key, with null for no-match") {
    val got = AsOf.join(trades, quotes, Seq("sym"), "tts", "qts")
      .select(col("id"), col("px"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> None, 2L -> Some(100.0), 3L -> Some(100.0), 4L -> Some(110.0),
      5L -> None, 6L -> Some(50.0), 7L -> None))
  }

  test("right key columns are dropped; right ts survives under its own name") {
    val out = AsOf.join(trades, quotes, Seq("sym"), "tts", "qts")
    assert(out.columns.count(_ == "sym") == 1)
    assert(out.columns.contains("qts"))
  }

  test("the custom strategy plans AsOfJoinExec (no window, no union)") {
    val df = AsOf.join(trades, quotes, Seq("sym"), "tts", "qts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("agrees with the scalar-subquery formulation on adversarial distributions") {
    // The hand-rolled SparkPlan declares its own distribution/ordering
    // requirements, so the shapes that stress EnsureRequirements get
    // their own cases: empty sides, empty partitions, one hot key,
    // all-equal timestamps (every comparison a tie), disjoint key sets.
    val r = new scala.util.Random(7)
    def rows(n: Int, keys: Seq[String], tsChoices: Seq[String]) =
      Seq.fill(n)((keys(r.nextInt(keys.size)),
        ts(tsChoices(r.nextInt(tsChoices.size))), r.nextLong()))
    val manyTs = (0 until 24).map(h => f"2024-01-01 $h%02d:00:00")
    val oneTs = Seq("2024-01-01 12:00:00")
    val cases: Seq[(String, Seq[(String, Timestamp, Long)], Seq[(String, Timestamp, Long)])] = Seq(
      ("empty right", rows(50, Seq("a", "b"), manyTs), Nil),
      ("empty left", Nil, rows(20, Seq("a", "b"), manyTs)),
      ("one hot key (skew + empty partitions)",
        rows(500, Seq("hot"), manyTs), rows(30, Seq("hot"), manyTs)),
      ("all timestamps equal on both sides",
        rows(100, Seq("a", "b", "c"), oneTs), rows(30, Seq("a", "b", "c"), oneTs)),
      ("disjoint key sets", rows(80, Seq("l1", "l2"), manyTs), rows(40, Seq("r1", "r2"), manyTs)),
      ("right denser than left", rows(5, Seq("a"), manyTs), rows(400, Seq("a"), manyTs)))
    cases.foreach { case (label, lRows, rRows) =>
      val lhs = lRows.toDF("k", "lts", "id")
      val rhs = rRows.toDF("k", "rts", "vl").dropDuplicates("k", "rts")
        .withColumn("v", col("vl").cast("double")).drop("vl")
      val got = AsOf.join(lhs, rhs, Seq("k"), "lts", "rts")
        .select(col("id"), col("v")).as[(Long, Option[Double])].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      lhs.createOrReplaceTempView("aslhs"); rhs.createOrReplaceTempView("asrhs")
      val expect = spark.sql(
        """SELECT id, (SELECT max_by(v, rts) FROM asrhs r
          |            WHERE r.k = l.k AND r.rts <= l.lts) AS v
          |FROM aslhs l""".stripMargin)
        .as[(Long, Option[Double])].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got == expect, s"case: $label")
    }
  }

  test("agrees with the window-over-union formulation on seeded random data") {
    val r = new scala.util.Random(11)
    val syms = Seq("x", "y", "z")
    val lhs = Seq.fill(300)((syms(r.nextInt(3)),
      ts(f"2024-01-01 ${r.nextInt(24)}%02d:${r.nextInt(60)}%02d:00"), r.nextLong())).toDF("k", "lts", "id")
    val rhs = Seq.fill(40)((syms(r.nextInt(3)),
      ts(f"2024-01-01 ${r.nextInt(24)}%02d:${r.nextInt(60)}%02d:00"), r.nextDouble())).toDF("k", "rts", "v")
      .dropDuplicates("k", "rts") // unique (key, ts) so the reference answer is total
    val got = AsOf.join(lhs, rhs, Seq("k"), "lts", "rts")
      .select(col("id"), col("v")).as[(Long, Option[Double])].collect().toMap
    // Reference: plain SQL — for each left row the max-rts right row <= lts.
    lhs.createOrReplaceTempView("aslhs"); rhs.createOrReplaceTempView("asrhs")
    val expect = spark.sql(
      """SELECT id, (SELECT max_by(v, rts) FROM asrhs r
        |            WHERE r.k = l.k AND r.rts <= l.lts) AS v
        |FROM aslhs l""".stripMargin)
      .as[(Long, Option[Double])].collect().toMap
    assert(got == expect)
  }
}
