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
}
