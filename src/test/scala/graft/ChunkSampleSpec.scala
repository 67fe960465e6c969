package graft

import org.scalatest.funsuite.AnyFunSuite

/** Operator laws for q50 (RAG chunking) and q107 (priority sampling)
  * at sf0.001 — the structural properties the DuckDB hash-match can't
  * articulate: the chunk grid reconstructs the token stream exactly
  * (the r10 tail-coverage fix made this a law; the original grid
  * dropped up to stride−1 trailing tokens per doc), and the
  * integer-scaled priorities select the same sample as exact rational
  * arithmetic.
  */
class ChunkSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val W = 32
  private val S = 24

  private def run(name: String) = SparkEntry.queries(name)(spark, dir).collect()

  private lazy val docTokens: Map[Long, Array[String]] = {
    import org.apache.spark.sql.functions._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), graft.functions.TextOps.tokens(col("text")).as("toks"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1).toArray)
      .toMap
  }

  test("q50: chunk grid is exact — stride starts, clipped windows, full count") {
    val rows = run("q50_chunking")
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == docTokens.keySet) // every doc chunks (short → 1 chunk)
    byDoc.foreach { case (id, chunks) =>
      val n = docTokens(id).length
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_id"))
      // count = ceil(max(n−W,0)/S) + 1: full windows plus the tail one.
      val expect = (math.max(n - W, 0) + S - 1) / S + 1
      assert(sorted.length == expect, s"doc $id chunk count")
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_id") == i + 1)
        val start = i * S // 0-based
        val len = math.max(math.min(W, n - start), 0)
        val toks = c.getAs[String]("chunk_text").split(" ", -1).filter(_.nonEmpty)
        assert(toks.length == len, s"doc $id chunk ${i + 1} window length")
        // Each chunk is literally the token window at its start.
        assert(toks.sameElements(docTokens(id).slice(start, start + len)))
      }
    }
  }

  test("q50: dropping each chunk's overlap tail reconstructs the token stream") {
    val rows = run("q50_chunking")
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_id"))
      val rebuilt = sorted.zipWithIndex.flatMap { case (c, i) =>
        val toks = c.getAs[String]("chunk_text").split(" ", -1).filter(_.nonEmpty)
        if (i == sorted.length - 1) toks else toks.take(S)
      }
      assert(rebuilt.sameElements(docTokens(id)), s"doc $id reconstruction")
    }
  }

  test("q50: consecutive full chunks overlap by exactly W-S tokens; every tail chunk adds content") {
    val rows = run("q50_chunking")
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_id"))
        .map(_.getAs[String]("chunk_text").split(" ", -1).filter(_.nonEmpty))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          if (a.length == W)
            assert(a.takeRight(W - S).sameElements(b.take(math.min(W - S, b.length))))
          // No chunk is fully contained in its predecessor: the grid
          // stops as soon as a window reaches the last token.
          assert(b.length > math.max(a.length - S, 0), s"doc $id redundant tail chunk")
        case _ => ()
      }
    }
  }

  test("q50: grid formula holds at every boundary length (synthetic 0..70-token docs)") {
    // One doc per token count n ∈ [0, 70] — crosses n < W, n = W,
    // n = W+1, exact stride multiples, and the empty doc (both
    // engines agree it yields one empty chunk; the corpus never
    // exercises these edges all at once).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_chunk_bounds")
      .toFile.getAbsolutePath
    (0 to 70).map { n =>
      (n.toLong, (0 until n).map(i => s"t$i").mkString(" "), "en", "s", n.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q50_chunking")(spark, dir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    (0 to 70).foreach { n =>
      val chunks = byDoc(n.toLong).sortBy(_.getAs[Long]("chunk_id"))
      assert(chunks.length == (math.max(n - W, 0) + S - 1) / S + 1, s"n=$n count")
      val rebuilt = chunks.zipWithIndex.flatMap { case (c, i) =>
        val toks = c.getAs[String]("chunk_text").split(" ", -1).filter(_.nonEmpty)
        if (i == chunks.length - 1) toks else toks.take(S)
      }
      assert(rebuilt.sameElements((0 until n).map(i => s"t$i")), s"n=$n reconstruction")
    }
  }

  /** The sample q107 must equal a sequential reference of the SAME
    * definition — per-lang top-k by the floored scaled priority
    * (w·2^32) div u, ties on ascending doc_id — computed independently
    * of the Spark pipeline (no CollectTopK, no joins). A separate
    * assertion then shows the 2^32 flooring is collision-free on this
    * corpus (distinct rationals w/u never share a floored priority),
    * which is what makes the floored ranking coincide with exact
    * rational ranking here. (Asserting against exact rationals
    * directly would be unsound: floor collisions are possible in
    * principle and the operator's defined tie-break is doc_id on the
    * FLOORED value — the reference must replicate the definition.) */
  test("q107: sample equals the sequential floored-priority reference; flooring is collision-free here") {
    import org.apache.spark.sql.functions._
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        least(col("n_chars"), lit(2097151L)).as("w"))
      .withColumn("u", pmod(graft.functions.TextOps.hash60(
        concat(col("doc_id").cast("string"), lit(":ps"))), lit(1048576L)) + 1)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("w"), r.getAs[Long]("u")))
    val expected = base.groupBy(_._2).view.mapValues { docs =>
      docs.map { case (id, _, w, u) => (id, w * 4294967296L / u) }
        .sortBy { case (id, pri) => (-pri, id) }
        .take(100).map(_._1).toSeq
    }.toMap
    val got = run("q107_priority_sample")
      .groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")).toSeq)
      .toMap
    assert(got == expected)
    // Collision-freedom: any two docs sharing a floored priority must
    // be the same exact rational (w1·u2 == w2·u1) — on this corpus no
    // distinct rational floor-collides, so floored == rational ranking.
    base.groupBy(t => (t._2, t._3 * 4294967296L / t._4)).values.foreach { g =>
      g.toSeq.combinations(2).foreach {
        case Seq((_, _, w1, u1), (_, _, w2, u2)) =>
          assert(BigInt(w1) * u2 == BigInt(w2) * u1,
            s"distinct rationals floor-collide: $w1/$u1 vs $w2/$u2")
        case _ => ()
      }
    }
  }

  test("q107: thresholds bound the sample and the estimator is exact on small strata") {
    val rows = run("q107_priority_sample")
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val tau = rs.map(_.getAs[Long]("tau")).distinct
      assert(tau.length == 1, s"$lang: one threshold per stratum")
      // Ranks are 1..|sample| dense; every sampled priority clears τ.
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rs.length.toLong))
      rs.foreach { r =>
        assert(r.getAs[Long]("pri") >= tau.head)
        val wEst = r.getAs[Long]("w_est_scaled")
        assert(wEst == math.max(r.getAs[Long]("w") * 4096L, tau.head))
        // Priority sampling's estimator never shrinks a weight.
        assert(wEst >= r.getAs[Long]("w") * 4096L)
      }
      // A stratum smaller than k has no (k+1)-th priority: τ = 0 and
      // the estimate degenerates to the exact weight.
      if (rs.length < 100) {
        assert(tau.head == 0L)
        rs.foreach(r => assert(
          r.getAs[Long]("w_est_scaled") == r.getAs[Long]("w") * 4096L))
      }
    }
  }
}
