package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the dedup machinery against independent references:
  * the distributed min-label-propagation connected components agree
  * with a driver-side union-find on randomized edge lists (including
  * long chains that need multiple propagation rounds), and the
  * inverted-index Jaccard computation agrees with brute-force pairwise
  * set algebra. Deterministic seeds — failures reproduce. */
class DedupLawsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference union-find with path compression. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // Canonical label = MIN vertex id of the component, matching the
    // min-label propagation's fixpoint.
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = verts.groupBy(find)
    byRoot.flatMap { case (_, vs) => vs.map(_ -> vs.min) }.toMap
  }

  test("connectedComponents ≡ union-find on random graphs (incl. deep chains)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 200
      val random = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // A 12-vertex path: diameter stresses multi-round propagation.
      val chainBase = 1000L + trial * 100
      val chain = (0 until 11).map(i => (chainBase + i, chainBase + i + 1))
      val all = (random ++ chain).flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val edges = all.toDF("a", "b").distinct()
      val got = DedupQueries.connectedComponents(edges, maxRounds = 40, tag = s"law$trial")
        .as[(Long, Long)].collect().toMap
      val want = unionFind(n, all)
      assert(got == want, s"trial $trial: CC labels diverge from union-find")
    }
  }

  test("connectedComponents: a 1000-link chain converges inside the round cap") {
    // The scale case that kills per-hop label propagation (1000 rounds,
    // one per hop): star contraction must close it in ~log n rounds.
    // Descending ids + an interleaved shuffle order so neither
    // orientation nor input order accidentally helps.
    val n = 1000
    val chain = (0 until n).map(i => (3000L + n - i, 3000L + n - i - 1))
    val shuffled = new scala.util.Random(5).shuffle(chain)
    val edges = shuffled.toDF("a", "b")
    val got = DedupQueries.connectedComponents(edges, maxRounds = 25, tag = "chain1000")
      .as[(Long, Long)].collect()
    assert(got.length == n + 1)
    assert(got.forall(_._2 == 3000L), "every chain vertex must label to the minimum")
  }

  test("connectedComponents: the cap round always runs the convergence check") {
    // The check fires on even rounds AND at the cap. With an odd cap of
    // 1: an already-star graph must be detected as converged at round 1
    // (not silently skipped past), and a graph that genuinely needs
    // more rounds must fail loudly rather than return a
    // partially-contracted labeling.
    val star = Seq((5L, 1L), (1L, 5L)).toDF("a", "b")
    val got = DedupQueries.connectedComponents(star, maxRounds = 1, tag = "cap1star")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 5L -> 1L))
    val path3 = Seq((1L, 2L), (2L, 3L), (3L, 4L)).flatMap { case (a, b) =>
      Seq((a, b), (b, a)) }.toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      DedupQueries.connectedComponents(path3, maxRounds = 1, tag = "cap1path")
        .as[(Long, Long)].collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("inverted-index Jaccard ≡ brute-force pairwise set algebra") {
    val rnd = new scala.util.Random(7)
    // 40 random docs over a 60-token vocabulary (dense enough to share).
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 20).map(_ => s"w${rnd.nextInt(60)}").distinct)
    }
    val rows = docs.flatMap { case (id, toks) => toks.map(t => (id, t)) }
      .toDF("doc_id", "t")
    // Inverted-index route: posting-list pre-agg → pair counts → |A∩B|.
    val totals = rows.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val pairs = rows.groupBy($"t")
      .agg(sort_array(collect_set($"doc_id")).as("ids"))
      .filter(size($"ids") > 1)
      .select(explode($"ids").as("id_a"), $"ids")
      .select($"id_a", explode($"ids").as("id_b"))
      .filter($"id_a" < $"id_b")
      .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("shared"))
      .join(totals.select($"doc_id".as("id_a"), $"n".as("na")), "id_a")
      .join(totals.select($"doc_id".as("id_b"), $"n".as("nb")), "id_b")
      .select($"id_a", $"id_b",
        ($"shared".cast("double") / ($"na" + $"nb" - $"shared")).as("j"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // Brute force over every pair.
    val sets = docs.map { case (id, toks) => id -> toks.toSet }.toMap
    for (a <- sets.keys; b <- sets.keys if a < b) {
      val inter = (sets(a) & sets(b)).size
      if (inter == 0) assert(!pairs.contains((a, b))) // no shared term, no pair
      else {
        val want = inter.toDouble / (sets(a) | sets(b)).size
        assert(math.abs(pairs((a, b)) - want) < 1e-12, s"pair ($a,$b)")
      }
    }
  }

  /** Driver-side reference for [[DedupQueries.jaccardSelfJoin]]: word
    * 3-shingle sets, all-pairs exact Jaccard, round(j,6) >= tau. */
  private def bruteJaccard(docs: Seq[(Long, String)], tau: Double)
      : Map[(Long, Long), (Int, Double)] = {
    def shingles(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size if inter > 0
      j = BigDecimal(inter.toDouble / (sa | sb).size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= tau
    } yield (a, b) -> (inter, j)).toMap
  }

  /** The q81 scale guard (df cap + positional-prefix rescue) is
    * LOSSLESS: a corpus with a planted hot stop-shingle — boilerplate
    * banner shingles shared by every doc, df far above the cap — yields
    * bit-identical pairs under an aggressive cap, including a pair
    * whose ONLY shared shingles are hot (the case a bare df cap would
    * silently drop, recovered by the prefix tier). */
  test("df-capped Jaccard join ≡ brute force under a planted hot stop-shingle") {
    val rnd = new scala.util.Random(13)
    val banner = "legal notice all rights reserved by the publisher" // 8 toks → 6 hot shingles
    // 60 docs: hot banner + a unique 12-token tail (tail shingles df=1).
    val base = (0 until 60).map { i =>
      (i.toLong, banner + " " + Seq.fill(12)(s"u${i}x${rnd.nextInt(1000)}").mkString(" "))
    }
    // A qualifying pair found through COLD shingles: shared tails (df=2).
    val coldPair = Seq(
      (200L, banner + " alpha beta gamma delta epsilon zeta eta theta"),
      (201L, banner + " alpha beta gamma delta epsilon zeta eta iota"))
    // A qualifying pair whose EVERY shared shingle is HOT: banner-only
    // docs (their shingles are exactly the banner's, df = 62 > cap).
    val hotOnlyPair = Seq((300L, banner), (301L, banner))
    val docs = base ++ coldPair ++ hotOnlyPair
    val u = docs.toDF("doc_id", "text")
    val tau = 0.6
    val want = bruteJaccard(docs, tau)
    assert(want.contains((300L, 301L)), "fixture: hot-only pair must qualify")
    assert(want.contains((200L, 201L)), "fixture: cold pair must qualify")

    // Cap of 8 with banner-df = 62: every banner shingle is hot.
    val dfCap = 8
    val got = DedupQueries.jaccardSelfJoin(u, tau, dfCap)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (a, b, n, j) => (a, b) -> (n.toInt, j) }.toMap
    assert(got == want,
      s"capped join diverges: missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")

    // Cap-invariance law: an effectively-uncapped run returns the same.
    val uncapped = DedupQueries.jaccardSelfJoin(u, tau, Int.MaxValue)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (a, b, n, j) => (a, b) -> (n.toInt, j) }.toMap
    assert(uncapped == got, "df cap changed the result set")

    // Degenerate corpus: EVERY doc identical (every shingle hot, every
    // pair qualifying — the output itself is quadratic). The hot-prefix
    // rescue must still return the complete pair set.
    val same = (0 until 20).map(i => (i.toLong, banner)).toDF("doc_id", "text")
    val allPairs = DedupQueries.jaccardSelfJoin(same, tau, dfCap)
      .as[(Long, Long, Long, Double)].collect()
    assert(allPairs.length == 20 * 19 / 2, s"got ${allPairs.length} of 190 pairs")
    assert(allPairs.forall { case (_, _, n, j) => n == 6 && j == 1.0 })
  }

  /** Randomized law: for corpora drawn over a SMALL shared vocabulary
    * (dense shingle sharing — many posting lists of every size, so the
    * cold/hot boundary lands in the thick of real data) the capped join
    * equals brute force for EVERY cap, including caps aggressive enough
    * to force most recall through the prefix tier. */
  test("df-capped Jaccard join ≡ brute force on random corpora, any cap") {
    for (trial <- 0 until 4) {
      val rnd = new scala.util.Random(100 + trial)
      // Trials 0-2: 35 docs, 8-14 tokens from a 12-word vocabulary —
      // heavy overlap, every posting list long. Trial 3: a 400-word
      // vocabulary — the SPARSE regime where most shingles are
      // singletons (df = 1), pinning the singleton-pruned ranking (the
      // i-th shared entry sits at full-set position n1 + i) against a
      // reference that ranks nothing.
      val vocab = if (trial == 3) 400 else 12
      val docs = (0 until 35).map { i =>
        val n = 8 + rnd.nextInt(7)
        (i.toLong, Seq.fill(n)(s"w${rnd.nextInt(vocab)}").mkString(" "))
      }
      // Sparse trial: re-plant guaranteed near-dup pairs, else the
      // brute-force reference is vacuously empty and proves nothing.
      val planted = if (trial == 3) (0 until 6).map { k =>
        val (_, t) = docs(k * 5)
        (500L + k, t.split(" ").drop(1).mkString(" "))
      } else Seq.empty
      val all = docs ++ planted
      val u = all.toDF("doc_id", "text")
      val tau = if (trial == 3) 0.5 else 0.35 + 0.1 * trial
      val want = bruteJaccard(all, tau)
      if (trial == 3) assert(want.nonEmpty, "sparse fixture must qualify pairs")
      for (dfCap <- Seq(1, 2, 4, 16)) {
        val got = DedupQueries.jaccardSelfJoin(u, tau, dfCap)
          .as[(Long, Long, Long, Double)].collect()
          .map { case (a, b, n, j) => (a, b) -> (n.toInt, j) }.toMap
        assert(got == want,
          s"trial $trial cap $dfCap tau $tau: " +
            s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
      }
    }
  }

  /** Brute-force one-sided containment reference: per (eval, train)
    * pair, |E ∩ T| / |E| over distinct word n-grams. */
  private def bruteContainment(evalDocs: Seq[(Long, String)],
      train: Seq[(Long, String)], n: Int, tau: Double)
      : Map[(Long, Long), (Long, Double)] = {
    def grams(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    }
    val es = evalDocs.map { case (id, t) => id -> grams(t) }.filter(_._2.nonEmpty)
    val ts = train.map { case (id, t) => id -> grams(t) }.filter(_._2.nonEmpty)
    (for {
      (e, ge) <- es; (t, gt) <- ts if e != t
      shared = (ge & gt).size if shared > 0
      c = BigDecimal(shared.toDouble / ge.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= tau
    } yield (e, t) -> (shared.toLong, c)).toMap
  }

  private def gramRows(docs: Seq[(Long, String)], n: Int): Seq[(Long, String)] =
    docs.flatMap { case (id, t) =>
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(n).filter(_.length == n).map(g => (id, g.mkString(" "))).toSeq
    }

  /** The q58/q84 scale guard (eval-gram semi-join + train-df prefix
    * bound) is LOSSLESS: a corpus with a planted hot boilerplate
    * banner — its grams shared by every train doc AND present in eval
    * docs, the exact shape whose df² pair cost the round-8 verdict
    * flagged — yields bit-identical containment results, including an
    * eval doc made ONLY of hot grams (whose matches must all be
    * recalled through the hot path the prefix cannot exclude). */
  test("containment join ≡ brute force under a planted hot boilerplate gram") {
    val rnd = new scala.util.Random(17)
    val banner = "this material is provided as is without any warranty whatsoever"
    val n = 4 // word 4-grams: the banner yields 7 hot grams
    // 50 train docs: banner + unique 16-token tail (banner grams have
    // train-df 50+, tail grams df 1).
    val train = (0 until 50).map { i =>
      (1000L + i, banner + " " + Seq.fill(16)(s"t${i}q${rnd.nextInt(997)}").mkString(" "))
    } ++ Seq(
      // A genuine containment hit: train doc 2000 embeds eval doc 3's
      // full text plus extra tokens.
      (2000L, "prefix filler words here alpha beta gamma delta epsilon zeta eta theta iota kappa and trailing junk"),
      // Banner-only train docs — every gram hot.
      (2001L, banner), (2002L, banner))
    val evalDocs = Seq(
      // Eval docs with the banner + unique tails: their hot grams must
      // rank last and generate no candidates, yet n_shared must still
      // count them exactly for any pair found through cold grams.
      (1L, banner + " " + Seq.fill(12)(s"e1u${rnd.nextInt(997)}").mkString(" ")),
      (2L, banner + " " + Seq.fill(12)(s"e2u${rnd.nextInt(997)}").mkString(" ")),
      // The doc train 2000 contains.
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // Pure-boilerplate eval doc: EVERY gram hot — its (many, genuine)
      // matches must all come back through the hot path.
      (4L, banner))
    val tau = 0.5
    val want = bruteContainment(evalDocs, train, n, tau)
    assert(want.contains((3L, 2000L)), "fixture: the embedded doc must qualify")
    assert(want.keySet.count(_._1 == 4L) >= 50,
      "fixture: the boilerplate eval doc must match the banner-carrying train docs")
    assert(!want.exists(_._1._1 == 1L), "fixture: banner-tail eval docs must NOT qualify")

    val eg = gramRows(evalDocs, n).distinct.toDF("eval_id", "g")
    val tg = gramRows(train, n).toDF("train_id", "g") // raw rows, like q58
    val got = DedupQueries.containmentJoin(eg, tg, tau)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (e, t, s, c) => (e, t) -> (s, c) }.toMap
    assert(got == want,
      s"guarded containment diverges: missing=${want.keySet -- got.keySet} " +
        s"extra=${got.keySet -- want.keySet}")
  }

  /** Randomized containment law over a dense shared vocabulary: every
    * df regime (hot, cold, absent-from-train) lands in the thick of
    * real data, for several thresholds. */
  test("containment join ≡ brute force on random corpora, any tau") {
    for (trial <- 0 until 3) {
      val rnd = new scala.util.Random(300 + trial)
      val vocab = 10 + trial * 10
      val evalDocs = (0 until 12).map { i =>
        (i.toLong, Seq.fill(6 + rnd.nextInt(6))(s"w${rnd.nextInt(vocab)}").mkString(" "))
      }
      val train = (0 until 40).map { i =>
        (500L + i, Seq.fill(8 + rnd.nextInt(8))(s"w${rnd.nextInt(vocab)}").mkString(" "))
      } ++ evalDocs.take(3).map { case (id, t) => // guaranteed full-containment hits
        (900L + id, t + s" w${rnd.nextInt(vocab)} w${rnd.nextInt(vocab)}")
      }
      val n = 3
      val tau = 0.3 + 0.15 * trial
      val want = bruteContainment(evalDocs, train, n, tau)
      assert(want.nonEmpty, s"trial $trial: fixture must qualify pairs")
      val eg = gramRows(evalDocs, n).distinct.toDF("eval_id", "g")
      val tg = gramRows(train, n).toDF("train_id", "g")
      val got = DedupQueries.containmentJoin(eg, tg, tau)
        .as[(Long, Long, Long, Double)].collect()
        .map { case (e, t, s, c) => (e, t) -> (s, c) }.toMap
      assert(got == want, s"trial $trial tau $tau: " +
        s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
    }
  }

  /** The novelty score's semantic contract: the first carrier of
    * content owns it; later verbatim copies score zero; partial copies
    * score exactly their unshared fraction. */
  test("noveltyScores: copies score 0, originals 1, partial copies in between") {
    val a = "alpha beta gamma delta epsilon zeta" // 6 toks → 4 shingles
    val docs = Seq(
      (1L, a),                                  // original: novelty 1
      (2L, a),                                  // verbatim copy: 0
      (3L, "one two three four five six"),      // unrelated: 1
      (4L, a + " omega psi chi phi"))           // superset: only the tail is new
    val got = DedupQueries.noveltyScores(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, n, nov, s) => id -> ((n, nov, s)) }.toMap
    assert(got(1L) == ((4L, 4L, 1.0)))
    assert(got(2L) == ((4L, 0L, 0.0)))
    assert(got(3L) == ((4L, 4L, 1.0)))
    // doc 4: 10 toks → 8 shingles; 4 inherited from doc 1, 4 new.
    assert(got(4L) == ((8L, 4L, 0.5)))
  }

  /** q95's hot-span guard (min<max share test) finds a corpus-wide
    * planted banner line — the exact hot-key shape the old
    * count_distinct aggregate would have built a giant set for — and
    * agrees with a brute-force span reference. */
  test("dupSpans: corpus-wide banner line detected; spans match brute force") {
    val w = 4
    val banner = "this document is confidential and proprietary to acme" // 8 toks
    val rnd = new scala.util.Random(29)
    val docs = (0 until 30).map { i =>
      // banner prefix + unique 10-token tail: the flagged region is the
      // banner's windows only (tail windows are unique per doc).
      (i.toLong, banner + " " + Seq.fill(10)(s"t${i}q${rnd.nextInt(1000)}").mkString(" "))
    }
    val got = DedupQueries.dupSpans(docs.toDF("doc_id", "text"), w)
      .as[(Long, Long, Long, Long)].collect().toSet
    // Brute force: hash windows driver-side, flag those in >= 2 docs,
    // merge adjacent flagged positions into maximal spans.
    val wins = docs.flatMap { case (id, t) =>
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(w).filter(_.length == w).zipWithIndex
        .map { case (win, p) => (id, p.toLong, win.mkString(" ")) }
    }
    val sharedW = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val want = wins.filter(x => sharedW(x._3)).groupBy(_._1).toSeq.flatMap {
      case (id, xs) =>
        val ps = xs.map(_._2).sorted
        // islands: consecutive positions merge
        val runs = ps.foldLeft(List.empty[List[Long]]) {
          case ((run @ (last :: _)) :: rest, p) if p == last + 1 =>
            (p :: run) :: rest
          case (acc, p) => List(p) :: acc
        }
        runs.map(r => (id, r.min, r.max + (w - 1), r.size.toLong))
    }.toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // Every doc carries the banner, so every doc must flag exactly one
    // span covering the banner's windows: positions 0..(9-w).
    assert(got.count(_._2 == 0L) == 30)
  }
}
