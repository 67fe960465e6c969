package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariant of the embed→retrieve loop (q48): a document's
  * nearest neighbor under its own embedding is itself, at cosine 1.0 —
  * the self-consistency check the DuckDB oracle cannot express because
  * the embedder is not SQL. */
class EmbedRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("self-retrieval: rank 1 is the query document at sim 1.0 (sf0.001)") {
    val out = SparkEntry.queries("q48_embed_retrieval")(spark, "/root/testdata/sf0.001")
      .select("query_id", "doc_id", "sim", "rn")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    val top1 = out.filter(_._4 == 1L)
    assert(top1.length == 5)
    assert(top1.forall { case (q, d, sim, _) => q == d && sim == 1.0 })
    // and the rest are genuinely below (distinct texts, random-ish words)
    assert(out.filter(_._4 > 1L).forall(_._3 < 1.0))
  }
}
