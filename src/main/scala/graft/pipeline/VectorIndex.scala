package graft.pipeline

import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF assignment index — the vector-tier sibling of
  * [[DedupIndex]]: the corpus's cell assignments `(vec_id, cell_id, d)`
  * live in a parquet table written once (by the initial bulk build /
  * prior appends), so an append pays only the BATCH's argmin
  * assignment plus one aggregate over the index for cell occupancy —
  * never a recomputation of the corpus's assignments. This is the
  * production precondition of q100's append triage, exactly as the
  * reference's pgvector table persists embeddings so later runs only
  * upsert the new window (src/storage/pgvector_storage.py:79-116).
  *
  * Centroids are the deterministic seed set (first `cells` vector ids,
  * the same stand-in q42 probes); a trained codebook (q93) drops in by
  * swapping the centroid frame — the index layout is unchanged.
  *
  * At 100 TB the index is bucketed by cell_id (SinkOps.writeBucketed is
  * the layout) and stores per-cell occupancy as a maintained aggregate;
  * here the occupancy aggregate runs over the index scan, which is
  * already O(corpus assignments), not O(corpus vectors × cells).
  */
object VectorIndex {

  /** Argmin cell assignment against broadcast centroids — the q42
    * min_by aggregate (map-side combine, no ranking window). */
  def assign(vectors: DataFrame, cents: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(cents))
      .withColumn("d", round(VectorOps.l2(col("ev"), col("cv")), 6))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cell_id"), col("d")),
        struct(col("d"), col("cell_id"))).as("a"))
      .select(col("vec_id"), col("a.cell_id").as("cell_id"), col("a.d").as("d"))

  /** Seed centroid frame: the first `cells` corpus vectors. */
  def seedCentroids(embeddings: DataFrame, cells: Int): DataFrame =
    embeddings.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell_id"), col("ev").as("cv"))

  /** One-time per-corpus index build (memoized + published via
    * [[PreparedArtifact]]; `cells` participates in the key so
    * differently-sized codebooks never collide). */
  def prepared(spark: SparkSession, sfDir: String, cells: Int): String =
    PreparedArtifact.publishOnce(spark, "graft_vec_index",
        s"${PreparedArtifact.fingerprint(spark, sfDir, "embeddings")}_$cells") { tmp =>
      val base = graft.Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("ev"))
      assign(base, seedCentroids(base, cells)).write.parquet(tmp.toString)
    }
}
