package graft.pipeline

import graft.sinks.JdbcSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's vector-store contract over a REAL connection
  * (pgvector_storage.py:79-116): `(vector_id PK, embedding,
  * semantic_sentence, updated_at)` with `INSERT … ON CONFLICT
  * (vector_id) DO UPDATE` semantics — restated as [[JdbcSink.upsert]]
  * (update-else-insert in transactional pages) against any JDBC URL.
  * Embedded Derby stands in for Postgres here; the calling code is
  * URL-portable.
  *
  * The embedding travels in pgvector's own text literal form
  * (`[x,y,…]` — the wire format psycopg sends a VECTOR as), so the
  * stored value would be directly castable server-side; Derby just
  * keeps the string. Idempotence and last-write-wins carry over from
  * the upsert: re-running a window (the reference's 1-day-overlap
  * reprocessing, main.py:341-369) updates in place instead of
  * duplicating.
  *
  * Deploying against real Postgres: [[graft.sinks.PgVectorSql]]
  * publishes the server-side statements Derby cannot execute — the
  * `VECTOR(1536)` DDL, the `ON CONFLICT` upsert with the `?::vector`
  * cast this store's text literal feeds, and the ivfflat/hnsw ANN
  * index + `<=>` top-k retrieval.
  */
object VectorStore {

  /** Bucket count for `key_hash`, the numeric split column stored
    * alongside the VARCHAR key: vanilla JDBC partitioning can't range-
    * split a string, so the writer persists `hash(vector_id) mod 1024`
    * and the reader issues one range query per split over it — N
    * parallel cursors instead of one cursor streaming the whole table
    * (a production Postgres read would compute the same split from
    * `hashtext(vector_id)`; persisting it keeps the read portable). */
  private val KeyHashBuckets = 1024

  private val Ddl =
    s"""vector_id VARCHAR(64) NOT NULL PRIMARY KEY,
      |embedding VARCHAR(32672) NOT NULL,
      |semantic_sentence VARCHAR(32672) NOT NULL,
      |updated_at DATE NOT NULL,
      |key_hash BIGINT NOT NULL""".stripMargin.replace("\n", " ")

  /** Serialize `(vector_id, semantic_sentence, embedding[], updated_at)`
    * to the storage row shape. */
  private def toRows(summaries: DataFrame): DataFrame =
    summaries.select(
      col("vector_id"),
      concat(lit("["), array_join(col("embedding"), ","), lit("]")).as("embedding"),
      col("semantic_sentence"),
      col("updated_at"),
      pmod(xxhash64(col("vector_id")), lit(KeyHashBuckets.toLong)).as("key_hash"))

  /** Upsert a batch of daily summaries; creates the table on first use.
    * Returns the update/insert split. */
  def store(summaries: DataFrame, url: String, table: String = "document_embeddings")
      : JdbcSink.UpsertStats = {
    JdbcSink.ensureTable(url, table, Ddl)
    JdbcSink.upsert(toRows(summaries), url, table, "vector_id", batchSize = 100)
  }

  /** Partitioned read-back of the stored table: `numPartitions`
    * parallel range queries over the persisted `key_hash` column, so
    * the scan never degrades to one global cursor. */
  def load(spark: SparkSession, url: String, table: String = "document_embeddings",
      numPartitions: Int = 8): DataFrame =
    JdbcSink.read(spark, url, table, "KEY_HASH", 0L, KeyHashBuckets.toLong, numPartitions)
      .select(col("VECTOR_ID").as("vector_id"), col("EMBEDDING").as("embedding"),
        col("SEMANTIC_SENTENCE").as("semantic_sentence"),
        col("UPDATED_AT").as("updated_at"))
}
