package graft

import graft.sinks.PgVectorSql
import org.scalatest.funsuite.AnyFunSuite

/** Pins the server-side pgvector statements to the reference's shapes
  * (pgvector_storage.py:87-107) and the public pgvector operator/DDL
  * surface — the contract a production Postgres deployment executes,
  * which the sandbox's Derby stand-in cannot. Golden-pinned so a
  * refactor can't silently drift the SQL a real deploy would run. */
class PgVectorSqlSpec extends AnyFunSuite {

  test("table DDL matches the reference schema plus the split column") {
    val ddl = PgVectorSql.createTable("document_embeddings")
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS document_embeddings"))
    assert(ddl.contains("vector_id TEXT PRIMARY KEY"))
    assert(ddl.contains(s"embedding VECTOR(${PgVectorSql.EmbeddingDim})"))
    assert(PgVectorSql.EmbeddingDim == 1536) // text-embedding-3-small
    assert(ddl.contains("semantic_sentence TEXT"))
    assert(ddl.contains("updated_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP"))
    assert(ddl.contains("key_hash BIGINT NOT NULL"))
    assert(PgVectorSql.createExtension == "CREATE EXTENSION IF NOT EXISTS vector;")
  }

  test("upsert is the reference's ON CONFLICT statement with a server-side vector cast") {
    val up = PgVectorSql.upsert("document_embeddings")
    assert(up.contains("INSERT INTO document_embeddings " +
      "(vector_id, embedding, semantic_sentence, updated_at, key_hash)"))
    assert(up.contains("?::vector"), "embedding parameter must cast the text literal")
    assert(up.contains("ON CONFLICT (vector_id) DO UPDATE SET"))
    assert(up.contains("embedding = EXCLUDED.embedding"))
    assert(up.contains("semantic_sentence = EXCLUDED.semantic_sentence"))
    assert(up.contains("key_hash = EXCLUDED.key_hash"))
  }

  test("ivfflat lists follow pgvector's published sizing rule") {
    assert(PgVectorSql.ivfLists(500) == 1) // floor at 1
    assert(PgVectorSql.ivfLists(100000) == 100) // rows/1000 under 1M
    assert(PgVectorSql.ivfLists(1000000) == 1000)
    assert(PgVectorSql.ivfLists(100000000) == 10000) // sqrt(rows) beyond
    val idx = PgVectorSql.ivfflatIndex("document_embeddings", 100000)
    assert(idx ==
      "CREATE INDEX IF NOT EXISTS document_embeddings_embedding_ivfflat " +
        "ON document_embeddings USING ivfflat (embedding vector_cosine_ops) " +
        "WITH (lists = 100);")
    assert(PgVectorSql.setIvfProbes(8) == "SET ivfflat.probes = 8;")
  }

  test("hnsw index uses the cosine opclass with documented defaults") {
    assert(PgVectorSql.hnswIndex("t") ==
      "CREATE INDEX IF NOT EXISTS t_embedding_hnsw ON t " +
        "USING hnsw (embedding vector_cosine_ops) WITH (m = 16, ef_construction = 64);")
  }

  test("server-side top-k orders by cosine distance and reports similarity") {
    val q = PgVectorSql.topK("document_embeddings", 3)
    assert(q.contains("1 - (embedding <=> ?::vector) AS cosine_sim"))
    assert(q.contains("ORDER BY embedding <=> ?::vector"))
    assert(q.contains("LIMIT 3;"))
  }

  test("read split predicate matches the partitioned load's range shape") {
    assert(PgVectorSql.readSplit("t") ==
      "SELECT * FROM t WHERE key_hash >= ? AND key_hash < ?")
  }
}
