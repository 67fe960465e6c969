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

  private def fingerprint(spark: SparkSession, sfDir: String): String = {
    val srcDir = new org.apache.hadoop.fs.Path(s"$sfDir/embeddings.parquet")
    val srcFs = srcDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listing = srcFs.listStatus(srcDir).toSeq
      .map(s => s"${s.getPath.getName}|${s.getLen}|${s.getModificationTime}")
      .sorted.mkString(s"$sfDir\n", "\n", "")
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private val preparedPaths = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One-time per-corpus index build (memoized per corpus FINGERPRINT
    * within the JVM, reused across JVMs via the _SUCCESS marker; the
    * build-into-tmp + rename publish makes concurrent builders safe —
    * same discipline as [[DedupIndex.prepared]]). `cells` participates
    * in the path so differently-sized codebooks never collide. */
  def prepared(spark: SparkSession, sfDir: String, cells: Int): String =
    preparedPaths.computeIfAbsent(s"${fingerprint(spark, sfDir)}_$cells", { key =>
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_vec_index_$key"
      val finalPath = new org.apache.hadoop.fs.Path(path)
      val fs = finalPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      if (!fs.exists(success)) {
        val tmp = new org.apache.hadoop.fs.Path(
          s"${path}_build_${java.util.UUID.randomUUID().toString.take(8)}")
        val base = graft.Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("ev"))
        assign(base, seedCentroids(base, cells)).write.parquet(tmp.toString)
        if (fs.exists(finalPath) && !fs.exists(success))
          fs.delete(finalPath, true) // clear a crashed partial build
        if (fs.exists(success) || !fs.rename(tmp, finalPath))
          fs.delete(tmp, true)
        // Post-verify the TOCTOU window (see DedupIndex): a concurrent
        // winner publishing between our check and rename would nest our
        // tmp INSIDE the published dir — remove the stray child.
        val nested = new org.apache.hadoop.fs.Path(finalPath, tmp.getName)
        if (fs.exists(nested)) fs.delete(nested, true)
      }
      path
    })
}
