package graft.pipeline

import graft.Materialize.CheckpointOps
import graft.operators.ReleaseQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persisted data-card index — the production form of q133's
  * card-on-append (the q129 datasheet maintained INCREMENTALLY, the
  * same discipline as [[DedupIndex]]/[[VectorIndex]]): two tables under
  * one fingerprint-keyed publish —
  *
  *   - `sigstats(sig, cnt, holder_source, holder_lang)`: one row per
  *     distinct content hash with its corpus count; the holder columns
  *     name the owning (source, lang) group and are only consulted
  *     when cnt = 1 (the doc that FLIPS from unexposed to exposed when
  *     an append collides with it).
  *   - `card(...)`: q129's ~|source x lang|-row aggregate, verbatim.
  *
  * An append then pays its own feature compute plus ONE probe of
  * sigstats keyed on the batch's hashes — never a corpus rescan, and
  * never a corpus-sized shuffle (the probe side broadcasts). At 100 TB
  * sigstats is bucketed by sig so the probe co-locates with the scan.
  */
object CardIndex {

  /** One-time per-corpus build, fingerprint-keyed and publish-once
    * (see [[PreparedArtifact]] for the concurrency discipline). */
  def prepared(spark: SparkSession, sfDir: String): String =
    PreparedArtifact.publishOnce(spark, "graft_card_index",
        PreparedArtifact.fingerprint(spark, sfDir, "documents")) { tmp =>
      val d = graft.Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
          col("text"))
      // One feature pass feeds BOTH tables (the sig aggregate and the
      // card): checkpoint so the corpus is featurized once.
      val f = ReleaseQueries.cardFeatures(d).checkpointed()
      f.groupBy(col("sig"))
        .agg(count(lit(1)).as("cnt"),
          // min() is just a determinism tie-break: the holder columns
          // are only ever read at cnt = 1, where they are exact.
          min(col("source")).as("holder_source"),
          min(col("lang")).as("holder_lang"))
        .write.mode("overwrite").parquet(s"$tmp/sigstats")
      ReleaseQueries.dataCardFromFeatures(f)
        .write.mode("overwrite").parquet(s"$tmp/card")
    }
}
