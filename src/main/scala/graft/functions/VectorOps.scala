package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column algebra over `ArrayType(Double)` (SURVEY.md §2.10
  * X1): dot / norm / cosine as higher-order functions — codegen-friendly,
  * no UDF, no driver round-trip, so a kNN scan distributes like any other
  * columnar projection.
  *
  * Accumulation is a sequential left fold in double precision; results are
  * rounded at call sites (6 decimals) before any threshold/ordering so
  * Spark and the DuckDB oracle agree bit-for-bit.
  *
  * Reference stores float32[1536] pgvector rows
  * (src/storage/pgvector_storage.py:92); similarity itself lives in the
  * sibling RAG repo, so this is the north-star addition (BASELINE.json).
  */
object VectorOps {

  /** Cast an ArrayType(Float) column to ArrayType(Double) (exact). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity; null-safe on zero vectors via nullif.
    * HOF reference implementation — [[cosine6]] (the hot path) goes
    * through the codegen'd [[graft.plans.CosineSim]] expression, which
    * computes the identical sequential fold inside WholeStageCodegen. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Cosine rounded to 6 decimals — the cross-engine-stable form. */
  def cosine6(a: Column, b: Column): Column =
    round(graft.plans.CosineSim(a, b), 6)

  /** L2 (Euclidean) distance — the codegen'd [[graft.plans.L2Dist]]
    * expression (identical sequential fold to the HOF chain it
    * replaced, which was CodegenFallback and allocated a zip_with
    * array per row — the dominant cost of argmin assignment scans). */
  def l2(a: Column, b: Column): Column = graft.plans.L2Dist(a, b)

  /** HOF reference implementation of [[l2]], kept for law-testing the
    * codegen expression against the fold semantics it must match. */
  def l2Hof(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))
}
