package graft

import graft.functions.TextOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of the text-algebra primitives the dedup/analysis
  * queries (q27-q36) are built from. */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eval1[T](text: String, c: Column => Column): T =
    Seq(text).toDF("t").select(c(col("t")).as("r")).collect().head.getAs[T]("r")

  private def evalSeq(text: String, c: Column => Column): List[String] =
    Seq(text).toDF("t").select(c(col("t")).as("r"))
      .collect().head.getSeq[String](0).toList

  test("tokens: lowercases, splits on non-alnum, drops empties") {
    assert(evalSeq("Hello, WORLD!! 42x  ", TextOps.tokens) ==
      List("hello", "world", "42x"))
    assert(evalSeq("", TextOps.tokens) == Nil)
    assert(evalSeq("!!!", TextOps.tokens) == Nil)
  }

  test("shingles: word 3-grams, distinct, short texts → empty") {
    assert(evalSeq("a b c d", t => TextOps.shingles(t, 3)) ==
      List("a b c", "b c d"))
    assert(evalSeq("a b", t => TextOps.shingles(t, 3)) == Nil)
    // repeated shingle appears once
    assert(evalSeq("x y z x y z x y", t => TextOps.shingles(t, 3)).size == 3)
  }

  test("hash60: 60-bit non-negative, stable, = first 15 md5 hex chars") {
    val h = eval1[Long]("hello", TextOps.hash60)
    // md5("hello") = 5d41402abc4b2a7... → 0x5d41402abc4b2a7
    assert(h == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
    assert(h >= 0 && h < (1L << 60))
  }

  test("simhash: deterministic, order-insensitive over term sets, bounded") {
    def sim(s: String) = eval1[Long](s, t => TextOps.simhash(TextOps.tokens(t)))
    assert(sim("alpha beta gamma") == sim("alpha beta gamma"))
    assert(sim("alpha beta gamma") == sim("gamma alpha beta")) // majority votes don't order
    assert(sim("alpha beta gamma") >= 0)
    assert(sim("") == 0L)
  }

  test("simhash: near-identical term sets are close in Hamming distance") {
    val words = (1 to 40).map(i => s"w$i")
    def sim(ws: Seq[String]) =
      eval1[Long](ws.mkString(" "), t => TextOps.simhash(TextOps.tokens(t)))
    val a = sim(words)
    val b = sim(words.drop(1)) // one term removed
    val hamming = java.lang.Long.bitCount(a ^ b)
    assert(hamming <= 12, s"hamming=$hamming")
  }

  test("fingerprint: order-SENSITIVE, whitespace/punct-insensitive") {
    def fp(s: String) = eval1[Long](s, TextOps.fingerprint)
    assert(fp("a b c") == fp("  A, b... C!")) // token sequence identical
    assert(fp("a b c") != fp("c b a"))        // order matters
    assert(fp("") == 0L)
  }

  test("bpeTokenCount: alpha runs + digit runs + single symbols") {
    assert(eval1[Long]("ab 12 c!", TextOps.bpeTokenCount) == 4L) // ab|12|c|!
    assert(eval1[Long]("hello", TextOps.bpeTokenCount) == 1L)
    assert(eval1[Long]("", TextOps.bpeTokenCount) == 0L)
  }

  test("occurrences: literal substring counting") {
    assert(eval1[Long]("aXbXXc", t => TextOps.occurrences(t, "X")) == 3L)
    assert(eval1[Long]("aaa", t => TextOps.occurrences(t, "aa")) == 1L)
  }
}
