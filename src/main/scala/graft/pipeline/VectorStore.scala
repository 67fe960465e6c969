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
  */
object VectorStore {

  private val Ddl =
    """vector_id VARCHAR(64) NOT NULL PRIMARY KEY,
      |embedding VARCHAR(32672) NOT NULL,
      |semantic_sentence VARCHAR(32672) NOT NULL,
      |updated_at DATE NOT NULL""".stripMargin.replace("\n", " ")

  /** Serialize `(vector_id, semantic_sentence, embedding[], updated_at)`
    * to the storage row shape. */
  private def toRows(summaries: DataFrame): DataFrame =
    summaries.select(
      col("vector_id"),
      concat(lit("["), array_join(col("embedding"), ","), lit("]")).as("embedding"),
      col("semantic_sentence"),
      col("updated_at"))

  /** Upsert a batch of daily summaries; creates the table on first use.
    * Returns the update/insert split. */
  def store(summaries: DataFrame, url: String, table: String = "document_embeddings")
      : JdbcSink.UpsertStats = {
    JdbcSink.ensureTable(url, table, Ddl)
    JdbcSink.upsert(toRows(summaries), url, table, "vector_id", batchSize = 100)
  }

  /** Partitioned read-back of the stored table (split on the id hash is
    * unavailable on a VARCHAR key in vanilla JDBC partitioning, so the
    * spec-scale read uses a single split; a production Postgres read
    * would pass predicates or use `hashtext`). */
  def load(spark: SparkSession, url: String, table: String = "document_embeddings")
      : DataFrame =
    spark.read.jdbc(url, table, JdbcSink.connectionProps)
      .select(col("VECTOR_ID").as("vector_id"), col("EMBEDDING").as("embedding"),
        col("SEMANTIC_SENTENCE").as("semantic_sentence"),
        col("UPDATED_AT").as("updated_at"))
}
