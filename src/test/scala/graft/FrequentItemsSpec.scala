package graft

import graft.plans.FrequentItems
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries laws, asserted across partitionings (the merge path runs
  * for real): the one-sided membership guarantee and the estimate bound
  * hold for EVERY layout of the same data, even though sub-threshold
  * membership may differ between layouts.
  */
class FrequentItemsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val M = 8
  private def skewed(n: Int) = {
    import spark.implicits._
    // 60% "hot", 20% "warm", rest spread over 40 cold keys.
    (0 until n).map { i =>
      if (i % 10 < 6) "hot" else if (i % 10 < 8) "warm" else s"cold_${i % 40}"
    }.toDF("item")
  }

  test("guarantee and bound hold under every partitioning") {
    val df = skewed(10000)
    val exact = df.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val slack = n / (M + 1)
    for (parts <- Seq(1, 3, 8, 32)) {
      val sk = df.repartition(parts)
        .agg(FrequentItems.sketch(col("item"), M).as("sk"))
        .head.getAs[Seq[Row]](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sk.size <= M, s"$parts parts: sketch exceeded m")
      exact.foreach { case (k, c) =>
        if (c > slack)
          assert(sk.contains(k), s"$parts parts: guaranteed item $k missing")
      }
      sk.foreach { case (k, est) =>
        val c = exact.getOrElse(k, 0L)
        assert(est <= c, s"$parts parts: $k overestimated ($est > $c)")
        assert(est >= c - slack, s"$parts parts: $k under bound ($est < ${c - slack})")
      }
    }
  }

  test("keys beyond the 64 KiB modified-UTF-8 cliff survive the merge path") {
    import spark.implicits._
    // writeUTF would throw UTFDataFormatException here: each hot key's
    // UTF-8 form is ~80 KB (document-text-sized). repartition(5) forces
    // real partial-aggregate serialize/merge across the shuffle.
    val big1 = "µ" * 40000 + "a" // 2-byte char ⇒ 80001 bytes UTF-8
    val big2 = "µ" * 40000 + "b"
    val df = (0 until 600)
      .map(i => if (i % 3 == 0) big1 else if (i % 3 == 1) big2 else s"small_$i")
      .toDF("item")
    val sk = df.repartition(5)
      .agg(FrequentItems.sketch(col("item"), M).as("sk"))
      .head.getAs[Seq[Row]](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk.contains(big1) && sk.contains(big2)) // both far above n/(m+1)
    assert(sk(big1) <= 200L && sk(big2) <= 200L)
  }

  test("degenerate case: cardinality <= m is exact") {
    import spark.implicits._
    val df = (0 until 900).map(i => s"k${i % 3}").toDF("item")
    val sk = df.repartition(7)
      .agg(FrequentItems.sketch(col("item"), M).as("sk"))
      .head.getAs[Seq[Row]](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk == Map("k0" -> 300L, "k1" -> 300L, "k2" -> 300L))
  }
}
