package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic local text embedder (SURVEY.md §2.10 U1).
  *
  * The reference calls OpenAI `text-embedding-3-small` per batch
  * (src/services/embedding_service.py:50-124, dim 1536, zero-vector on
  * error). Offline + reproducible here: a seeded hash-projection
  * embedding — token t contributes ±1/√d at dims derived from
  * xxhash64(t, seed_i) — expressed entirely in columnar HOFs so it
  * distributes with the scan (no driver round-trip, no UDF serialization).
  *
  * Like the real service, embeddings are L2-normalized and the text is
  * newline-flattened first (embedding_service.py:67 — the reference's
  * literal-"\\n" bug is fixed here per SURVEY F3).
  */
object Embedder {
  val Dim = 64 // matches testdata embeddings dim; reference uses 1536

  /** Embed `textCol` into an ArrayType(Double) column of dimension [[Dim]].
    *
    * Construction: for each of the Dim dims, fold the token array summing
    * sign hashes; then L2-normalize. Pure column algebra — codegen'd.
    */
  def embed(textCol: Column): Column = {
    val cleaned = regexp_replace(textCol, "\\s+", " ")
    val toks = split(lower(cleaned), "[^a-z0-9]+")
    // raw(i) = Σ_tok sign(xxhash64(tok, i))
    val raw = transform(sequence(lit(0), lit(Dim - 1)), i =>
      aggregate(toks, lit(0.0), (acc, t) =>
        acc + when(t === "", lit(0.0))
          .otherwise(when(pmod(xxhash64(t, i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0)))))
    val nrm = sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x))
    when(nrm > 0, transform(raw, x => x / nrm))
      .otherwise(raw) // zero vector on empty text (embedding_service.py:86)
  }

  /** Attach an `embedding` column to a frame with a text column. */
  def withEmbedding(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("embedding", embed(col(textCol)))
}
