package graft.sinks

/** The server-side pgvector surface, generated as the exact SQL a
  * production Postgres deployment runs — the piece Derby cannot execute
  * (no VECTOR type), published here so a user pointing [[graft.pipeline.VectorStore]]
  * at real Postgres has the DDL, upsert, ANN index, and retrieval
  * statements the reference implies.
  *
  * Sources: reference `src/storage/pgvector_storage.py:87-96` (the
  * `CREATE EXTENSION` + `VECTOR(1536)` table), `:99-107` (the
  * `ON CONFLICT (vector_id) DO UPDATE` upsert), and the public pgvector
  * README for the ivfflat/hnsw index DDL, the `<=>` cosine-distance
  * operator, and the lists/probes sizing guidance.
  *
  * The wire format is already aligned: [[graft.pipeline.VectorStore]]
  * stores embeddings as pgvector's own text literal `[x,y,…]`
  * (spec-pinned to parse back bit-equal), which is exactly what the
  * `?::vector` casts below consume. */
object PgVectorSql {

  val EmbeddingDim = 1536 // text-embedding-3-small (reference :93)

  def createExtension: String = "CREATE EXTENSION IF NOT EXISTS vector;"

  /** The reference's table (pgvector_storage.py:89-96) plus the
    * `key_hash` split column the partitioned Spark read-back needs —
    * on real Postgres it is populated the same way the writer computes
    * it, so JDBC range splits work identically. */
  def createTable(table: String, dim: Int = EmbeddingDim): String =
    s"""CREATE TABLE IF NOT EXISTS $table (
       |  vector_id TEXT PRIMARY KEY,
       |  embedding VECTOR($dim),
       |  semantic_sentence TEXT,
       |  updated_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
       |  key_hash BIGINT NOT NULL
       |);""".stripMargin

  /** Last-write-wins upsert (pgvector_storage.py:99-107): one statement
    * per row, batched `page_size=100` by the reference; the Spark
    * writer sends the same statement through JDBC `addBatch`. The
    * embedding parameter is the `[x,y,…]` text literal cast
    * server-side. */
  def upsert(table: String): String =
    s"""INSERT INTO $table (vector_id, embedding, semantic_sentence, updated_at, key_hash)
       |VALUES (?, ?::vector, ?, CURRENT_TIMESTAMP, ?)
       |ON CONFLICT (vector_id) DO UPDATE SET
       |  embedding = EXCLUDED.embedding,
       |  semantic_sentence = EXCLUDED.semantic_sentence,
       |  updated_at = CURRENT_TIMESTAMP,
       |  key_hash = EXCLUDED.key_hash;""".stripMargin

  /** IVF index for cosine retrieval. pgvector's published sizing rule:
    * `lists = rows/1000` up to ~1M rows, `sqrt(rows)` beyond — the same
    * cell-count shape the engine's own IVF tier (q42/q93) trains. */
  def ivfLists(rowCount: Long): Int =
    math.max(1, if (rowCount <= 1000000L) (rowCount / 1000).toInt
    else math.sqrt(rowCount.toDouble).toInt)

  def ivfflatIndex(table: String, rowCount: Long): String =
    s"CREATE INDEX IF NOT EXISTS ${table}_embedding_ivfflat ON $table " +
      s"USING ivfflat (embedding vector_cosine_ops) WITH (lists = ${ivfLists(rowCount)});"

  /** HNSW alternative (pgvector ≥0.5): better recall/latency at higher
    * build cost; parameters are pgvector's documented defaults. */
  def hnswIndex(table: String, m: Int = 16, efConstruction: Int = 64): String =
    s"CREATE INDEX IF NOT EXISTS ${table}_embedding_hnsw ON $table " +
      s"USING hnsw (embedding vector_cosine_ops) WITH (m = $m, ef_construction = $efConstruction);"

  /** Server-side ANN top-k: `<=>` is pgvector's cosine DISTANCE
    * (1 − cosine similarity), so ascending order matches the engine's
    * descending-similarity top-k (q26/q91) on the same vectors. The
    * probe count trades recall for latency exactly like the engine's
    * multi-probe tier (q30). */
  def topK(table: String, k: Int): String =
    s"""SELECT vector_id, semantic_sentence, 1 - (embedding <=> ?::vector) AS cosine_sim
       |FROM $table
       |ORDER BY embedding <=> ?::vector
       |LIMIT $k;""".stripMargin

  def setIvfProbes(probes: Int): String = s"SET ivfflat.probes = $probes;"

  /** One JDBC read-back split (the partitioned load
    * [[graft.pipeline.VectorStore.load]] plans): real Postgres could
    * also derive the bucket on the fly as
    * `abs(hashtext(vector_id)) % buckets`, but reading the persisted
    * column keeps the scan index-assisted and portable. */
  def readSplit(table: String): String =
    s"SELECT * FROM $table WHERE key_hash >= ? AND key_hash < ?"
}
