package graft

import graft.plans.PHash64
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the 64-bit perceptual hash (q104's fingerprint):
  * interpreted eval == codegen'd eval, the LOCALITY bound a
  * single-byte edit must obey (the property q104's planted near-dups
  * lean on), and the empty/short-payload edges.
  */
class PHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("codegen and interpreted eval agree on random payloads") {
    import spark.implicits._
    val rnd = new scala.util.Random(104)
    val payloads = (0 until 200).map { i =>
      val n = rnd.nextInt(600) // includes < 72-byte and empty payloads
      val b = new Array[Byte](n); rnd.nextBytes(b); (i.toLong, b)
    }
    val df = payloads.toDF("id", "payload")
      .select(col("id"), PHash64(col("payload")).as("ph"))
    val fromSpark = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    payloads.foreach { case (id, b) =>
      assert(fromSpark(id) == PHash64.compute(b),
        s"codegen diverges from PHash64.compute for payload $id")
    }
  }

  test("locality: one byte edit flips at most 2 bits (its cell's two comparisons)") {
    // A byte belongs to exactly one grid cell; cell (r, c) feeds at most
    // two comparisons — against its left and right neighbors (one at the
    // row edges c = 0 / c = 8).
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val n = 72 + rnd.nextInt(430)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      val e = b.clone(); e(rnd.nextInt(n)) = rnd.nextInt(256).toByte
      assert(hamming(PHash64.compute(b), PHash64.compute(e)) <= 2)
    }
  }

  test("last-byte edit flips at most 1 bit (q104's planted-near-dup law)") {
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val n = 72 + rnd.nextInt(400)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      val e = b.clone(); e(n - 1) = 'q'.toByte
      // The last byte lives in cell 71, the grid's bottom-right corner,
      // which appears only as the RIGHT side of bit 63's comparison.
      assert(hamming(PHash64.compute(b), PHash64.compute(e)) <= 1)
      assert(((PHash64.compute(b) ^ PHash64.compute(e)) & ~(1L << 63)) == 0L,
        "a last-byte edit flipped a bit other than 63")
    }
  }

  test("empty and sub-grid payloads hash to defined values (empty cells = bit unset)") {
    assert(PHash64.compute(Array.emptyByteArray) == 0L)
    // n < 72: some cells empty; must not throw, and equal payloads agree.
    val tiny = "abc".getBytes
    assert(PHash64.compute(tiny) == PHash64.compute("abc".getBytes))
  }

  test("null payload yields null") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Array[Byte]]), (2L, Some("hello world".getBytes)))
      .toDF("id", "payload")
      .select(col("id"), PHash64(col("payload")).as("ph"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(1))
    assert(!rows(1).isNullAt(1))
  }
}
