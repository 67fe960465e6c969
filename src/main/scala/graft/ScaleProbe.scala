package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale probe for the heavy dedup/similarity tier (VERDICT r7 #3,
  * extended r9 with a first-class ADVERSARIAL mode): does each plan's
  * cost actually grow ~linearly with the corpus, or only on the benched
  * sf0.1?
  *
  * CLEAN mode synthesizes an "sf1" corpus from sf0.1 — `Copies`
  * stride-shifted replicas where
  *
  *  - every document's tokens get a per-copy suffix (`the` → `thezq3`),
  *    so cross-copy shingle sets are DISJOINT: each replica reproduces
  *    sf0.1's intra-corpus dup/near-dup structure exactly and the
  *    planted-overlap output grows linearly BY CONSTRUCTION — any
  *    superlinear cost is therefore the plan's fault, not the data's;
  *  - every embedding gets a per-(copy, dim) deterministic sign flip —
  *    a diagonal ±1 orthogonal transform, so within-copy inner
  *    products are preserved EXACTLY while cross-copy cosines
  *    decorrelate (expected overlap of two independent ±1 masks is
  *    half the dims → cosine ≈ 0).
  *
  * ADVERSARIAL mode (arg 3 = "adversarial") builds the hostile corpus
  * the guards exist for, at BOTH scales (a 1-copy baseline and the
  * 10-copy corpus, so ratios compare like with like):
  *
  *  - a fixed 16-token boilerplate BANNER prepended to every document
  *    — its shingles/8-grams are hot on every side of every join
  *    (df = the whole corpus, across copies), the exact df² shape that
  *    broke q28's old r=1 banding and that q58/q84's containment
  *    prefix guard must suppress;
  *  - the per-copy marker that SPLITS under the `[a-z0-9]+` tokenizer
  *    (`the` → `the_c3`), interleaving a copy-marker token between
  *    every pair of words — the r8 stop-shingle stress (df in the
  *    thousands within each copy);
  *  - language skew: 99% of docs report one language — the q102 DSIR
  *    histogram/selection stress (VERDICT r8 #3).
  *
  * For each heavy query it records wall seconds and shuffle bytes at
  * both scales (min wall of two passes; shuffle from the first — byte
  * counts reproduce exactly; a pass-2 failure is recorded under its
  * own `remeasure_error` key). The judge-readable law: shuffle_ratio ≤
  * ~Copies × slack. Queries whose candidate generation is blocked on a
  * FIXED grid (q99's 64 IVF cells) are additionally probed with the
  * block count scaled ∝ corpus — the knob a cluster deployment turns —
  * to show the engine, not just the sf0.1 configuration, scales.
  *
  * Usage: java ... graft.ScaleProbe [sf01Dir] [outJson] [clean|adversarial]
  * (synthesized corpora are cached under /tmp and reused)
  */
object ScaleProbe {

  val Copies = 10
  /** Id stride per replica — clears sf0.1's max doc_id (4999) plus the
    * largest planted-copy shift any query uses (+90000, q104's
    * perturbed-copy plant; margin 5001 ids). A new plant must stay
    * under Stride − 5000 or cross-copy ids collide in the probe
    * corpus and mint phantom duplicate pairs. */
  val Stride = 100000L

  /** Boilerplate banner for the adversarial corpus: 16 plain tokens →
    * its word n-grams (3-shingles through 8-grams) are shared by EVERY
    * document at EVERY scale, on eval and train sides alike. */
  val Banner: String = "this document is provided as is without warranty " +
    "of any kind either express or implied"

  /** The heavy tier: the most expensive dedup/ANN/text queries of
    * BENCH_FULL.json plus the guarded contamination pair (r9 — the
    * last candidate generators without hostile-corpus evidence), plus
    * the two round-11 composites (r11 ask #7): the cross-modal CC
    * (q114 — both edge generators + the joint star contraction under
    * the hostile corpus) and the learned manifest (q117 — dedup +
    * model gate + BPE billing end to end; its persisted artifacts are
    * pre-built below so the measured numbers are the manifest run, not
    * the one-time training). */
  val Heavy: Seq[String] = Seq(
    "q28_minhash_pairs", "q32_simhash_bands", "q58_contamination",
    "q59_dup_clusters", "q64_repetition_filter", "q69_pmi_bigrams",
    "q81_ngram_jaccard", "q84_bloom_decontam", "q86_canonical_pick",
    "q95_dup_spans", "q98_novelty_score", "q99_semantic_prune",
    "q102_dsir_select", "q103_lm_perplexity", "q114_crossmodal_manifest",
    "q115_quality_classifier", "q117_learned_manifest",
    // r12 release family: q127/q130 are hash-keyed (rows-ratio laws);
    // q128/q131 compose three text-carrying signal frames (chars-ratio);
    // q129's dup window keys on md5(text) (rows-ratio).
    "q127_train_order", "q128_quality_ensemble", "q129_data_card",
    "q130_shard_plan", "q131_quality_curriculum", "q132_curriculum_shards")

  /** Synthesize a `copies`-replica corpus (documents + embeddings — all
    * the heavy tier reads) into `outDir`, memoized on a marker file. */
  def synthesize(spark: SparkSession, baseDir: String, outDir: String,
      copies: Int, adversarial: Boolean): Unit = {
    val marker = new java.io.File(s"$outDir/_GRAFT_DONE")
    if (marker.exists()) return
    val docs = Tables.load(spark, baseDir, "documents")
    (0 until copies).map { i =>
      // Clean mode keeps the suffix INSIDE one token under the engine's
      // [a-z0-9]+ tokenizer, so per-copy token and shingle STRUCTURE
      // stay identical to sf0.1 and ratios read as pure scale.
      // Adversarial mode picks the suffix that SPLITS ("_c3"),
      // interleaving a marker token between every pair of words — the
      // r8 boilerplate stress — and prepends the corpus-wide banner.
      // EVERY adversarial copy is marked, including copy 0: the 1-copy
      // baseline must carry the same per-doc hostile structure (~2×
      // tokens, within-copy stop-shingles) as the replicas, or the
      // 10× ratio would mix scale growth with per-doc gram inflation.
      val suffixed =
        if (!adversarial && i == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          t => concat(t, lit(if (adversarial) s"_c$i" else s"zq$i"))), " ")
      val text =
        if (adversarial) concat(lit(Banner + " "), suffixed) else suffixed
      val lang =
        if (adversarial) when(pmod(col("doc_id"), lit(100)) === 0, col("lang"))
          .otherwise(lit("en"))
        else col("lang")
      docs.select((col("doc_id") + i * Stride).as("doc_id"), text.as("text"),
        lang.as("lang"), col("source"), length(text).cast("long").as("n_chars"))
    }.reduce(_ unionAll _)
      .repartition(32) // many-file layout: scans start parallel, as in prod
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = Tables.load(spark, baseDir, "embeddings")
    (0 until copies).map { i =>
      val vec =
        if (i == 0) col("embedding")
        else transform(col("embedding"), (x, j) =>
          when(pmod(xxhash64(j * lit(31) + lit(i)), lit(2)) === 0, x).otherwise(-x))
      emb.select((col("vec_id") + i * Stride).as("vec_id"),
        vec.cast("array<float>").as("embedding"), col("label"))
    }.reduce(_ unionAll _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    marker.createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outFile = args.lift(1).getOrElse("SCALE_r09.json")
    val adversarial = args.lift(2).contains("adversarial")
    val spark = ProbeHarness.session()

    // Both scales of the measured corpus. Clean mode compares raw sf0.1
    // against its 10-copy replica; adversarial mode synthesizes BOTH
    // scales hostile (banner + markers + lang skew), so the ratio
    // isolates scale growth instead of mixing in clean-vs-hostile.
    val (smallDir, bigDir) =
      if (adversarial) {
        val s = "/tmp/graft_scaleprobe_advbase"
        val b = "/tmp/graft_scaleprobe_advsf1"
        synthesize(spark, baseDir, s, 1, adversarial = true)
        synthesize(spark, baseDir, b, Copies, adversarial = true)
        (s, b)
      } else {
        val b = "/tmp/graft_scaleprobe_sf1"
        synthesize(spark, baseDir, b, Copies, adversarial = false)
        (baseDir, b)
      }

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // Codegen warm pass (same rationale as Bench): every probed query
    // once at the smallest SF so measured numbers are data cost.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      (Heavy ++ Seq("q104_media_phash_dedup", "q108_bpe_train",
        "q109_bpe_segment")).foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir)
        .write.mode("overwrite").format("noop").save()
      catch { case scala.util.control.NonFatal(_) => () }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    // q117 reads TWO persisted artifacts (BPE merges + qc model): build
    // them for both probe corpora BEFORE measurement — the production
    // precondition (they exist before any manifest run), and without
    // this the FIRST measured pass would absorb the one-time training
    // shuffle into q117's reading (shuffle_mb keeps pass 1's value).
    for (d <- Seq(smallDir, bigDir)) {
      try { operators.TextQueries.bpeMergesPrepared(spark, d); () }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[probe] bpe merges prep '$d' failed: ${e.getMessage}") }
      try { operators.CurationQueries.qcModelPrepared(spark, d); () }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[probe] qc model prep '$d' failed: ${e.getMessage}") }
    }

    def measureOnce(frame: => DataFrame): (Double, Double, Option[String]) = {
      org.apache.spark.GraftSpark.drainListeners(spark.sparkContext)
      val s0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val err =
        try { frame.write.mode("overwrite").format("noop").save(); None }
        catch { case scala.util.control.NonFatal(e) => Some(ProbeHarness.errMsg(e)) }
      val elapsed = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSpark.drainListeners(spark.sparkContext)
      val mb = (shuffleBytes.get() - s0) / 1048576.0
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (elapsed, mb, err)
    }
    // min-of-two wall, shuffle from the first pass; pass-2 failures
    // recorded separately — see ProbeHarness.minOfTwo.
    def measure(frame: => DataFrame): ProbeHarness.Measured[Double] =
      ProbeHarness.minOfTwo(() => measureOnce(frame))

    import ProbeHarness.{f3, jstr}

    final case class Row(name: String, small: ProbeHarness.Measured[Double],
        big: ProbeHarness.Measured[Double])
    val rows = Heavy.map { name =>
      val mS = measure(SparkEntry.queries(name)(spark, smallDir))
      System.gc()
      val mL = measure(SparkEntry.queries(name)(spark, bigDir))
      System.gc()
      // Record BOTH scales' failures, labeled — orElse would silently
      // drop a big-corpus failure whenever the baseline also failed.
      val err = (mS.error.map("base: " + _) ++ mL.error.map("10x: " + _))
        .reduceOption(_ + "; " + _)
      println(s"[probe] $name base ${f3(mS.sec)}s/${f3(mS.payload)}MB " +
        s"10x ${f3(mL.sec)}s/${f3(mL.payload)}MB" + err.fold("")(e => s" ERR $e"))
      Row(name, mS, mL)
    }

    // q99 with the block grid scaled ∝ corpus (64 → 640 cells): the
    // configuration a cluster deployment runs, showing within-cell pair
    // work is a knob, not a wall. Uses the same engine function as the
    // registered query; only the cell count differs. Clean mode only —
    // the adversarial corpus stresses text joins, not the vector grid.
    import graft.Materialize.CheckpointOps
    val scaledCells = if (adversarial) None else Some {
      // The checkpointed base is rebuilt INSIDE the measured thunk:
      // measureOnce unpersists all persistent RDDs after each pass, so
      // a checkpoint shared across passes would lose its only blocks
      // before pass 2 and fail the re-run. Rebuilding per pass also
      // matches what every registered query pays per measurement.
      val m = measure {
        val base = Tables.load(spark, bigDir, "embeddings")
          .select(col("vec_id"),
            functions.VectorOps.asDouble(col("embedding")).as("ev"))
          .checkpointed()
        operators.SimilarityQueries.semanticPrune(
          base, 64 * Copies, operators.SimilarityQueries.SemCellCap)
      }
      println(s"[probe] q99_scaled_cells 10x ${f3(m.sec)}s/${f3(m.payload)}MB" +
        m.error.fold("")(e => s" ERR $e"))
      m
    }

    // q130/q132 with the prefix-sum bucket fan-out scaled ∝ corpus
    // (256 → 2048; VERDICT r12 #4): the spark.graft.prefixBuckets knob
    // bounds the within-bucket cumsum task at corpus/buckets bytes the
    // way IVF cells bound cell occupancy. Buckets are CONTIGUOUS
    // ranges of the write order, so the OUTPUT is identical at any
    // setting (ReleaseSpec pins it; q130's oracle has no bucket at
    // all) — this row shows the knob's runtime is flat, i.e. turning
    // it at 100 TB costs nothing while capping task size. Clean mode
    // only — the knob is layout, not text structure.
    val scaledBuckets = if (adversarial) None else Some {
      spark.conf.set("spark.graft.prefixBuckets", "2048")
      try {
        val m130 = measure(SparkEntry.queries("q130_shard_plan")(spark, bigDir))
        val m132 = measure(SparkEntry.queries("q132_curriculum_shards")(spark, bigDir))
        println(s"[probe] q130_scaled_buckets 10x ${f3(m130.sec)}s/${f3(m130.payload)}MB" +
          m130.error.fold("")(e => s" ERR $e"))
        println(s"[probe] q132_scaled_buckets 10x ${f3(m132.sec)}s/${f3(m132.payload)}MB" +
          m132.error.fold("")(e => s" ERR $e"))
        (m130, m132)
      } finally spark.conf.unset("spark.graft.prefixBuckets")
    }

    // q103 under a DEGENERATE-VOCABULARY corpus (VERDICT r9 #5):
    // every token remapped onto a 50-word vocabulary, so the bigram
    // MODEL table collapses to ~2.5k rows while the bigram stream
    // keeps its full row count — exactly the shape where a stats-blind
    // plan would broadcast the corpus side onto one task (the trap the
    // pinned shuffle_hash build side exists for). Measured at BOTH
    // scales; the law is shuffle ≈ copies like every hash-keyed row.
    // Adversarial mode only — this is a hostile-structure stress.
    val tinyVocab = if (!adversarial) None else Some {
      def synthTiny(outDir: String, copies: Int): Unit = {
        val marker = new java.io.File(s"$outDir/_GRAFT_DONE")
        if (marker.exists()) return
        val docs = Tables.load(spark, baseDir, "documents")
        (0 until copies).map { i =>
          // Same empty-token filter as TextOps.tokens (ADVICE r10 #3):
          // without it a leading/trailing separator mints a spurious
          // 'w'+hash('') token the real tokenizer would never produce,
          // putting the probe corpus slightly off-model.
          val text = array_join(transform(
            filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= ""),
            t => concat(lit("w"), pmod(xxhash64(t), lit(50)))), " ")
          docs.select((col("doc_id") + i * Stride).as("doc_id"),
            text.as("text"), col("lang"), col("source"),
            length(text).cast("long").as("n_chars"))
        }.reduce(_ unionAll _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
        marker.createNewFile()
      }
      // _v2 suffix: the corpora are memoized on marker files, and the r11
      // empty-token fix changed their content — a stale pre-fix cache
      // must not serve this round's rows.
      val tinyBase = "/tmp/graft_scaleprobe_tinyvbase_v2"
      val tinyBig = "/tmp/graft_scaleprobe_tinyvsf1_v2"
      synthTiny(tinyBase, 1); synthTiny(tinyBig, Copies)
      val mS = measure(SparkEntry.queries("q103_lm_perplexity")(spark, tinyBase))
      val mL = measure(SparkEntry.queries("q103_lm_perplexity")(spark, tinyBig))
      println(s"[probe] q103_tiny_vocab base ${f3(mS.sec)}s/${f3(mS.payload)}MB " +
        s"10x ${f3(mL.sec)}s/${f3(mL.payload)}MB" +
        (mS.error.map("base: " + _) ++ mL.error.map("10x: " + _))
          .reduceOption(_ + "; " + _).fold("")(e => s" ERR $e"))
      // q108 on the SAME fixed-50-word corpus pair: the BPE trainer's
      // scale claim is "merge-round cost is vocab-sized, independent of
      // corpus rows" — with the vocabulary pinned at both scales, only
      // the initial word-count aggregate may grow, so WALL should stay
      // near-flat at 10× rows. A wall ratio tracking the corpus would
      // falsify the claim (rounds secretly touching corpus-sized data).
      val b8S = measure(SparkEntry.queries("q108_bpe_train")(spark, tinyBase))
      val b8L = measure(SparkEntry.queries("q108_bpe_train")(spark, tinyBig))
      println(s"[probe] q108_tiny_vocab base ${f3(b8S.sec)}s/${f3(b8S.payload)}MB " +
        s"10x ${f3(b8L.sec)}s/${f3(b8L.payload)}MB" +
        (b8S.error.map("base: " + _) ++ b8L.error.map("10x: " + _))
          .reduceOption(_ + "; " + _).fold("")(e => s" ERR $e"))
      (mS, mL, b8S, b8L)
    }

    // The OPPOSITE BPE stress (VERDICT r10 #6): a NO-REPEAT vocabulary —
    // every token position minted globally unique, so vocab ≈ corpus and
    // the word table the merge rounds rewrite is NOT small. The
    // tiny-vocab row pins "rounds are vocab-sized"; this row pins the
    // other end of the claim: when the vocabulary IS the corpus, round
    // cost degrades LINEARLY (shuffle ≈ copies ×), never quadratically —
    // the word-keyed windows and pair counts are all hash-partitioned on
    // w, and nothing joins words against words. q109 adds the
    // apply-side law on the same corpus pair (its one corpus-sized join
    // stays keyed, merge rules stay 8 rows regardless of vocab).
    // Adversarial mode only — hostile-structure stress.
    val uniqVocab = if (!adversarial) None else Some {
      def synthUniq(outDir: String, copies: Int): Unit = {
        val marker = new java.io.File(s"$outDir/_GRAFT_DONE")
        if (marker.exists()) return
        val docs = Tables.load(spark, baseDir, "documents")
        (0 until copies).map { i =>
          val text = array_join(transform(
            filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= ""),
            (t, j) => concat(t, lit("u"),
              (col("doc_id") + i * Stride).cast("string"), lit("x"),
              j.cast("string"))), " ")
          docs.select((col("doc_id") + i * Stride).as("doc_id"),
            text.as("text"), col("lang"), col("source"),
            length(text).cast("long").as("n_chars"))
        }.reduce(_ unionAll _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
        marker.createNewFile()
      }
      val uBase = "/tmp/graft_scaleprobe_uniqvbase"
      val uBig = "/tmp/graft_scaleprobe_uniqvsf1"
      synthUniq(uBase, 1); synthUniq(uBig, Copies)
      val t8S = measure(SparkEntry.queries("q108_bpe_train")(spark, uBase))
      val t8L = measure(SparkEntry.queries("q108_bpe_train")(spark, uBig))
      println(s"[probe] q108_uniq_vocab base ${f3(t8S.sec)}s/${f3(t8S.payload)}MB " +
        s"10x ${f3(t8L.sec)}s/${f3(t8L.payload)}MB" +
        (t8S.error.map("base: " + _) ++ t8L.error.map("10x: " + _))
          .reduceOption(_ + "; " + _).fold("")(e => s" ERR $e"))
      val s9S = measure(SparkEntry.queries("q109_bpe_segment")(spark, uBase))
      val s9L = measure(SparkEntry.queries("q109_bpe_segment")(spark, uBig))
      println(s"[probe] q109_uniq_vocab base ${f3(s9S.sec)}s/${f3(s9S.payload)}MB " +
        s"10x ${f3(s9L.sec)}s/${f3(s9L.payload)}MB" +
        (s9S.error.map("base: " + _) ++ s9L.error.map("10x: " + _))
          .reduceOption(_ + "; " + _).fold("")(e => s" ERR $e"))
      (t8S, t8L, s9S, s9L)
    }

    // q114 under the shared adversarial corpus INHERITS q104's
    // property: the same-length copy markers plus the shared banner
    // make every cross-copy replica a REAL byte-level near-dup, so the
    // media edge set (and the CC's input) grows quadratically in
    // copies BY THE CORPUS'S CONSTRUCTION — the main q114 row's
    // above-copies shuffle ratio is genuine output volume, not plan
    // shape (exactly the q104_shifted_copies rationale). This
    // dedicated row keeps the FULL hostile text structure (banner +
    // splitting markers + lang skew) but prepends copy i with a
    // 7·i-byte prefix, scattering the pHash block grid across copies:
    // cross-copy media pairs vanish, edges grow ~copies ×, and the law
    // this row asserts for the joint plan is shuffle ≈ copies ×.
    val q114Shifted = if (!adversarial) None else Some {
      def synth(outDir: String, copies: Int): Unit = {
        val marker = new java.io.File(s"$outDir/_GRAFT_DONE")
        if (marker.exists()) return
        val docs = Tables.load(spark, baseDir, "documents")
        (0 until copies).map { i =>
          val suffixed = array_join(transform(split(col("text"), " "),
            t => concat(t, lit(s"_c$i"))), " ")
          val text0 = concat(lit(Banner + " "), suffixed)
          val text =
            if (i == 0) text0 else concat(lit("z" * (7 * i) + " "), text0)
          val lang = when(pmod(col("doc_id"), lit(100)) === 0, col("lang"))
            .otherwise(lit("en"))
          docs.select((col("doc_id") + i * Stride).as("doc_id"), text.as("text"),
            lang.as("lang"), col("source"), length(text).cast("long").as("n_chars"))
        }.reduce(_ unionAll _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
        marker.createNewFile()
      }
      val b1 = "/tmp/graft_scaleprobe_adv114base"
      val b10 = "/tmp/graft_scaleprobe_adv114sf1"
      synth(b1, 1); synth(b10, Copies)
      val mS = measure(SparkEntry.queries("q114_crossmodal_manifest")(spark, b1))
      val mL = measure(SparkEntry.queries("q114_crossmodal_manifest")(spark, b10))
      println(s"[probe] q114_shifted_adversarial base ${f3(mS.sec)}s/${f3(mS.payload)}MB " +
        s"10x ${f3(mL.sec)}s/${f3(mL.payload)}MB" +
        (mS.error.map("base: " + _) ++ mL.error.map("10x: " + _))
          .reduceOption(_ + "; " + _).fold("")(e => s" ERR $e"))
      (mS, mL)
    }

    // q104 probes its OWN copy structure (both modes): the shared
    // transforms perturb every token by a SAME-LENGTH suffix/marker,
    // which a perceptual hash correctly reads as near-identical bytes —
    // measured on the shared clean 10× corpus, every cross-copy
    // same-doc pair sits within Hamming 3, so output there is quadratic
    // in copies BY THE CORPUS'S CONSTRUCTION (those are real byte-level
    // near-dups), not a plan defect. The dedicated corpus instead
    // prepends copy i with a 7·i-byte prefix: all 72 cell boundaries
    // shift by more than a cell per copy step, block means decorrelate,
    // and cross-copy fingerprints scatter — the structure under which
    // output and shuffle MUST read ~copies ×, which is the law this row
    // asserts for the banded plan.
    val phashShifted = {
      def synth(outDir: String, copies: Int): Unit = {
        val marker = new java.io.File(s"$outDir/_GRAFT_DONE")
        if (marker.exists()) return
        val docs = Tables.load(spark, baseDir, "documents")
        (0 until copies).map { i =>
          val text =
            if (i == 0) col("text")
            else concat(lit("z" * (7 * i) + " "), col("text"))
          docs.select((col("doc_id") + i * Stride).as("doc_id"),
            text.as("text"), col("lang"), col("source"),
            length(text).cast("long").as("n_chars"))
        }.reduce(_ unionAll _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
        marker.createNewFile()
      }
      val phBase = "/tmp/graft_scaleprobe_phbase"
      val phBig = "/tmp/graft_scaleprobe_phsf1"
      synth(phBase, 1); synth(phBig, Copies)
      val mS = measure(SparkEntry.queries("q104_media_phash_dedup")(spark, phBase))
      val mL = measure(SparkEntry.queries("q104_media_phash_dedup")(spark, phBig))
      println(s"[probe] q104_shifted_copies base ${f3(mS.sec)}s/${f3(mS.payload)}MB " +
        s"10x ${f3(mL.sec)}s/${f3(mL.payload)}MB" +
        (mS.error.map("base: " + _) ++ mL.error.map("10x: " + _))
          .reduceOption(_ + "; " + _).fold("")(e => s" ERR $e"))
      (mS, mL)
    }

    val qjson = rows.map { case Row(name, mS, mL) =>
      val ratioT = if (mS.sec > 0) mL.sec / mS.sec else -1.0
      val ratioMb = if (mS.payload > 0.005) mL.payload / mS.payload else -1.0
      val err = (mS.error.map("base: " + _) ++ mL.error.map("10x: " + _))
        .reduceOption(_ + "; " + _)
      val rerr = (mS.remeasureError.map("base: " + _) ++
        mL.remeasureError.map("10x: " + _)).reduceOption(_ + "; " + _)
      s""""$name":{"base_sec":${f3(mS.sec)},"base_shuffle_mb":${f3(mS.payload)},""" +
        s""""big_sec":${f3(mL.sec)},"big_shuffle_mb":${f3(mL.payload)},""" +
        s""""wall_ratio":${f3(ratioT)},"shuffle_ratio":${f3(ratioMb)}""" +
        err.fold("")(e => s""","error":"${jstr(e)}"""") +
        rerr.fold("")(e => s""","remeasure_error":"${jstr(e)}"""") + "}"
    }.mkString("{", ",", "}")
    val extra = scaledCells.fold("") { m =>
      s""","q99_scaled_cells_sf1":{"cells":${64 * Copies},"sec":${f3(m.sec)},""" +
        s""""shuffle_mb":${f3(m.payload)}""" +
        m.error.fold("")(e => s""","error":"${jstr(e)}"""") + "}"
    } + scaledBuckets.fold("") { case (m130, m132) =>
      def row(tag: String, m: ProbeHarness.Measured[Double]): String =
        s""","$tag":{"buckets":2048,"sec":${f3(m.sec)},""" +
          s""""shuffle_mb":${f3(m.payload)},""" +
          s""""law":"output identical at any bucket count (contiguous ranges of the write order — ReleaseSpec pin); cost ~flat vs the fixed-256 10x row, so buckets ∝ corpus caps within-bucket task size for free"""" +
          m.error.fold("")(e => s""","error":"${jstr(e)}"""") + "}"
      row("q130_scaled_buckets_sf1", m130) + row("q132_scaled_buckets_sf1", m132)
    } + tinyVocab.fold("") { case (mS, mL, b8S, b8L) =>
      val err = (mS.error.map("base: " + _) ++ mL.error.map("10x: " + _))
        .reduceOption(_ + "; " + _)
      val err8 = (b8S.error.map("base: " + _) ++ b8L.error.map("10x: " + _))
        .reduceOption(_ + "; " + _)
      s""","q103_tiny_vocab":{"vocab":50,"base_sec":${f3(mS.sec)},""" +
        s""""base_shuffle_mb":${f3(mS.payload)},"big_sec":${f3(mL.sec)},""" +
        s""""big_shuffle_mb":${f3(mL.payload)},""" +
        s""""shuffle_ratio":${f3(if (mS.payload > 0.005) mL.payload / mS.payload else -1.0)}""" +
        err.fold("")(e => s""","error":"${jstr(e)}"""") + "}" +
      s""","q108_tiny_vocab":{"vocab":50,"base_sec":${f3(b8S.sec)},""" +
        s""""base_shuffle_mb":${f3(b8S.payload)},"big_sec":${f3(b8L.sec)},""" +
        s""""big_shuffle_mb":${f3(b8L.payload)},""" +
        s""""wall_ratio":${f3(if (b8S.sec > 0) b8L.sec / b8S.sec else -1.0)},""" +
        s""""law":"wall near-flat at 10x rows (merge rounds are vocab-sized)"""" +
        err8.fold("")(e => s""","error":"${jstr(e)}"""") + "}"
    } + uniqVocab.fold("") { case (t8S, t8L, s9S, s9L) =>
      def row(tag: String, mS: ProbeHarness.Measured[Double],
          mL: ProbeHarness.Measured[Double], law: String): String = {
        val err = (mS.error.map("base: " + _) ++ mL.error.map("10x: " + _))
          .reduceOption(_ + "; " + _)
        s""","$tag":{"vocab":"~corpus (every position unique)",""" +
          s""""base_sec":${f3(mS.sec)},"base_shuffle_mb":${f3(mS.payload)},""" +
          s""""big_sec":${f3(mL.sec)},"big_shuffle_mb":${f3(mL.payload)},""" +
          s""""wall_ratio":${f3(if (mS.sec > 0) mL.sec / mS.sec else -1.0)},""" +
          s""""shuffle_ratio":${f3(if (mS.payload > 0.005) mL.payload / mS.payload else -1.0)},""" +
          s""""law":"$law"""" +
          err.fold("")(e => s""","error":"${jstr(e)}"""") + "}"
      }
      row("q108_uniq_vocab", t8S, t8L,
        "shuffle ~<= copies x: corpus-sized word table, rounds stay hash-keyed, never quadratic") +
        row("q109_uniq_vocab", s9S, s9L,
          "shuffle ~<= copies x: apply side stays one keyed join; rule table fixed at K rows")
    } + q114Shifted.fold("") { case (mS, mL) =>
      val err = (mS.error.map("base: " + _) ++ mL.error.map("10x: " + _))
        .reduceOption(_ + "; " + _)
      s""","q114_shifted_adversarial":{"prefix_bytes_per_copy":7,"base_sec":${f3(mS.sec)},""" +
        s""""base_shuffle_mb":${f3(mS.payload)},"big_sec":${f3(mL.sec)},""" +
        s""""big_shuffle_mb":${f3(mL.payload)},""" +
        s""""shuffle_ratio":${f3(if (mS.payload > 0.005) mL.payload / mS.payload else -1.0)},""" +
        s""""law":"shuffle ~<= copies x once the pHash grid scatters; the main q114 row's higher ratio is corpus-constructed cross-copy media edges (same-length markers + shared banner = real byte near-dups), not plan shape — the q104_shifted_copies rationale"""" +
        err.fold("")(e => s""","error":"${jstr(e)}"""") + "}"
    } + {
      val (mS, mL) = phashShifted
      val err = (mS.error.map("base: " + _) ++ mL.error.map("10x: " + _))
        .reduceOption(_ + "; " + _)
      s""","q104_shifted_copies":{"prefix_bytes_per_copy":7,"base_sec":${f3(mS.sec)},""" +
        s""""base_shuffle_mb":${f3(mS.payload)},"big_sec":${f3(mL.sec)},""" +
        s""""big_shuffle_mb":${f3(mL.payload)},""" +
        s""""shuffle_ratio":${f3(if (mS.payload > 0.005) mL.payload / mS.payload else -1.0)}""" +
        err.fold("")(e => s""","error":"${jstr(e)}"""") + "}"
    }
    // Input-volume context: suffix/banner tokens inflate CHAR volume
    // beyond the row ratio, and text-carrying shuffles scale with
    // bytes — ratios should be read against chars_ratio for queries
    // that shuffle strings, rows (= copies) for hash-only ones.
    val charsRatio = {
      def chars(dir: String): Long = Tables.load(spark, dir, "documents")
        .agg(sum(col("n_chars"))).head().getLong(0)
      chars(bigDir).toDouble / chars(smallDir)
    }
    val mode = if (adversarial) "adversarial" else "clean"
    // Engine stamps (VERDICT r9 #8): the hostile-corpus numbers are only
    // comparable under the engines that produced them — a version drift
    // must name itself in the artifact, as in the oracle gate.
    val json = s"""{"probe":"heavy-tier 10x scale ($mode)","copies":$Copies,""" +
      s""""base":"$smallDir","spark_version":"${spark.version}",""" +
      s""""scala_version":"${scala.util.Properties.versionNumberString}",""" +
      s""""java_version":"${System.getProperty("java.version")}",""" +
      s""""chars_ratio":${f3(charsRatio)},""" +
      s""""law":"shuffle_ratio ~<= copies (hash-keyed) / chars_ratio (text-carrying); wall_ratio documented per query",""" +
      s""""queries":$qjson$extra}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    println(json)
    spark.stop()
  }
}
