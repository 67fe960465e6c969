package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / MERGE semantics without a transactional table format
  * (SURVEY.md §2.2 K1; reference: INSERT … ON CONFLICT (vector_id) DO
  * UPDATE, src/storage/pgvector_storage.py:102-105).
  *
  * Batch model: dedup-last-wins over key columns by an explicit ordering,
  * then (at a real sink) partition-overwrite by date. The window shuffle
  * hashes by key — the same exchange a MERGE would need — so the 100 TB
  * cost is one shuffle of the incoming batch, not a rewrite of the table.
  */
object Upsert {

  /** Keep the first row per key under `ordering` (newest-first → last
    * write wins). Ordering must be total (add a unique tiebreaker). */
  def lastWins(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** F16 schema-intersect projection before a fixed-schema sink
    * (reference: weather.py:137-140). */
  def schemaIntersect(df: DataFrame, sinkColumns: Seq[String]): DataFrame =
    df.select(df.columns.filter(sinkColumns.contains).map(col).toSeq: _*)
}
