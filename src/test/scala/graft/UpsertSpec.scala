package graft

import graft.operators.Upsert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Last-write-wins upsert semantics (reference: INSERT … ON CONFLICT DO
  * UPDATE, src/storage/pgvector_storage.py:102-105) and the
  * schema-intersect sink projection (weather.py:137-140). */
class UpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame = Seq(
    ("k1", 1L, "old"), ("k1", 3L, "new"), ("k1", 2L, "mid"),
    ("k2", 5L, "only"),
    ("k3", 7L, "a"), ("k3", 7L, "b") // tie on version → id breaks it
  ).toDF("key", "version", "payload")

  private val ordering = Seq(col("version").desc, col("payload").desc)

  test("lastWins keeps exactly the newest row per key") {
    val out = Upsert.lastWins(frame, Seq("key"), ordering)
      .as[(String, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("k1", 3L, "new"), ("k2", 5L, "only"), ("k3", 7L, "b")))
  }

  test("lastWins is idempotent: applying twice equals applying once") {
    val once = Upsert.lastWins(frame, Seq("key"), ordering)
    val twice = Upsert.lastWins(once, Seq("key"), ordering)
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("lastWins of a reprocessed (overlapping) batch converges — T2 overlap model") {
    // The reference fetches each day twice (1-day overlap) and relies on
    // the idempotent upsert for convergence (src/main.py:341-369).
    val reprocessed = frame.unionAll(frame) // same batch arrives again
    val out = Upsert.lastWins(reprocessed, Seq("key"), ordering)
    assert(out.collect().toSet ==
      Upsert.lastWins(frame, Seq("key"), ordering).collect().toSet)
  }

  test("schemaIntersect keeps only sink columns, in frame order") {
    val projected = Upsert.schemaIntersect(frame, Seq("payload", "key", "not_there"))
    assert(projected.columns.toSeq == Seq("key", "payload"))
    assert(projected.count() == 6)
  }
}
