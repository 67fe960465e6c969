package graft

import graft.pipeline.DedupIndex
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the persisted dedup index (the production form of q68):
  * planted batch classes triage correctly against a built index, and
  * append-then-retriage CONVERGES — nothing is 'new' twice.
  */
class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def corpus = Tables.load(spark, dir, "documents").select("doc_id", "text")

  /** q68's batch: every 4th doc — verbatim (%12), first token dropped
    * (%8 not %12), token-reversed (else → must triage 'new'). */
  private def batch = corpus.filter(col("doc_id") % 4 === 0)
    .select((col("doc_id") + 90000).as("doc_id"),
      when(col("doc_id") % 12 === 0, col("text"))
        .when(col("doc_id") % 8 === 0, regexp_replace(col("text"), "^[a-z0-9]+ ", ""))
        .otherwise(concat_ws(" ", reverse(graft.functions.TextOps.tokens(col("text")))))
        .as("text"))

  test("triage against a built index matches the planted classes") {
    val root = Files.createTempDirectory("graft_dedup_idx").toFile.getAbsolutePath
    DedupIndex.build(corpus, s"$root/index")
    val verdicts = DedupIndex
      .triage(spark, s"$root/index", DedupIndex.signatures(batch))
      .collect().map(r => r.getAs[Long]("doc_id") - 90000 -> r.getAs[String]("verdict")).toMap
    assert(verdicts.nonEmpty)
    // Verbatim copies MUST hash-match; token-reversed docs share no
    // shingles with anything indexed, so they MUST come out new.
    verdicts.foreach { case (id, v) =>
      if (id % 12 == 0) assert(v == "exact_dup", s"verbatim doc $id triaged $v")
      else if (id % 8 != 0) assert(v == "new", s"reversed doc $id triaged $v")
      else assert(v != "exact_dup", s"perturbed doc $id triaged $v")
    }
    // The near class is statistical: a dropped token flips few SimHash
    // bits for typical docs but can exceed the Hamming budget for very
    // short ones — most of the class must still be recovered.
    val nearClass = verdicts.filter { case (id, _) => id % 8 == 0 && id % 12 != 0 }
    assert(nearClass.nonEmpty)
    val recovered = nearClass.count(_._2 == "near_dup")
    assert(recovered * 2 > nearClass.size,
      s"only $recovered of ${nearClass.size} near-dups recovered")
  }

  test("prepared() keys the cached index on corpus content, not the dir name") {
    // Regenerating a dataset in place must invalidate the cached index:
    // same dir string, different file content → a DIFFERENT index path,
    // so no JVM can triage new data against stale signatures.
    val root = Files.createTempDirectory("graft_dedup_prep").toFile.getAbsolutePath
    corpus.limit(50).write.parquet(s"$root/documents.parquet")
    val first = DedupIndex.prepared(spark, root)
    assert(new java.io.File(first, "_SUCCESS").exists())
    // Regenerate with different content (and byte size, so the listing
    // fingerprint changes even on coarse-mtime filesystems).
    corpus.limit(80).write.mode("overwrite").parquet(s"$root/documents.parquet")
    val second = DedupIndex.prepared(spark, root)
    assert(second != first, "regenerated corpus served a stale cached index")
    assert(new java.io.File(second, "_SUCCESS").exists())
    // Same content again → same cached path, no rebuild churn.
    assert(DedupIndex.prepared(spark, root) == second)
  }

  test("append converges: a re-triaged batch is never 'new' twice") {
    val root = Files.createTempDirectory("graft_dedup_idx2").toFile.getAbsolutePath
    val idx = s"$root/index"
    DedupIndex.build(corpus, idx)
    val before = spark.read.parquet(idx).count()
    val first = DedupIndex.append(spark, idx, batch)
    val firstNew = first.filter(col("verdict") === "new")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(firstNew.nonEmpty)
    // Index grew by exactly the accepted docs.
    assert(spark.read.parquet(idx).count() == before + firstNew.size)
    // Second pass over the SAME batch: formerly-new docs are now exact
    // duplicates of their own indexed signatures; nothing is 'new'.
    val second = DedupIndex
      .triage(spark, idx, DedupIndex.signatures(batch)).collect()
    assert(!second.exists(_.getAs[String]("verdict") == "new"))
    second.filter(r => firstNew.contains(r.getAs[Long]("doc_id")))
      .foreach(r => assert(r.getAs[String]("verdict") == "exact_dup"))
  }

  test("q120 streams the triage: >= 2 micro-batches, stream == batch verdicts") {
    // q120's correctness claim in-engine (the oracle gate proves
    // stream ≡ DuckDB; this pins stream ≡ the q68 batch plan directly
    // and that the drain really crossed a micro-batch boundary).
    val stream = SparkEntry.queries("q120_stream_triage")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val asBatch = SparkEntry.queries("q68_incremental_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(stream.nonEmpty && stream == asBatch,
      s"stream verdicts drift from batch: ${(stream diff asBatch).take(3)} / ${(asBatch diff stream).take(3)}")
    // Boundary discipline, OBSERVED not assumed (ADVICE r11): see
    // StreamChecks — ≥2 committed micro-batches in the checkpoint, ≥2
    // non-empty source part files drained at maxFilesPerTrigger=1.
    StreamChecks.assertCrossedBoundary("q120")
  }

  test("q122 takedown: audits reconcile and the forgotten really re-admit") {
    val rows = SparkEntry.queries("q122_takedown")(spark, dir)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("n")).toMap
    for (art <- Seq("dedup_index", "ivfpq_codes")) {
      // 'after' is COUNTED from the published post-takedown table (not
      // derived arithmetic), so this reconciliation actually checks
      // the anti-join rewrite of each artifact.
      assert(rows(s"${art}_before") ==
        rows(s"${art}_removed") + rows(s"${art}_after"),
        s"$art audit does not reconcile: $rows")
      assert(rows(s"${art}_removed") > 0, s"$art removal list was empty")
    }
    // Every removed doc re-triages as SOMETHING (the verdict counts
    // partition the removal list)...
    val retriaged = rows.collect { case (k, n) if k.startsWith("retriage_") => n }.sum
    assert(retriaged == rows("dedup_index_removed"),
      s"re-triage lost docs: $rows")
    // ...and at least one is truly forgotten ('new'): the removal list
    // (doc_id % 37) contains docs whose content no survivor carries.
    assert(rows.getOrElse("retriage_new", 0L) > 0,
      s"takedown forgot nothing — purged signatures still matching? $rows")
  }

  test("q125 takedown completion: index purge reconciles, aggregate artifacts retrain") {
    val rows = SparkEntry.queries("q125_takedown_artifacts")(spark, dir)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("n")).toMap
    // The assignment index: counted from the PUBLISHED post-takedown
    // table, so before == removed + after checks the anti-join rewrite,
    // and the leak row proves no removed vec_id survived it.
    assert(rows("vec_index_before") ==
      rows("vec_index_removed") + rows("vec_index_after"),
      s"vec_index audit does not reconcile: $rows")
    assert(rows("vec_index_removed") > 0, "removal list was empty")
    assert(rows("vec_index_leak") == 0,
      s"removed vec_ids survive in the published index: $rows")
    // The retrained aggregate artifacts exist with their full shape...
    assert(rows("bpe_rules_n") > 0, s"BPE retrain produced no rules: $rows")
    assert(rows("qc_w_rows") > 0, s"qc retrain produced no weights: $rows")
    // ...and the retrain is REAL, not a copy: removing 1/37 of the
    // corpus shifts every gradient sum, so at 6dp at least one weight
    // must move (bpe_rules_changed may legitimately be 0 — the top-8
    // pair ranking can survive a small removal — so it is reported,
    // not asserted).
    assert(rows("qc_weights_changed") > 0,
      s"retrained qc model identical to the persisted one — retrain-on-takedown is a no-op? $rows")
  }
}
