package graft

import graft.pipeline.{DailySummary, VectorStore}
import graft.sinks.JdbcSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The flagship E1 sink over a REAL connection: the DailySummary frame
  * upserted into a pgvector-shaped JDBC table (embedded Derby), with
  * the reference's contract asserted end-to-end — one row per
  * vector_id, overlap re-runs update in place, replays are idempotent,
  * and the embedding round-trips in pgvector text-literal form. */
class VectorStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("pipeline -> JDBC upsert -> read-back: one row per day, values intact") {
    val url = JdbcSink.memoryUrl("graft_vstore_e2e")
    val summaries = DailySummary.run(spark, sfDir).localCheckpoint()
    val n = summaries.count()
    assert(n > 0)
    val first = VectorStore.store(summaries, url)
    assert(first == JdbcSink.UpsertStats(updated = 0, inserted = n))
    val back = VectorStore.load(spark, url)
    assert(back.count() == n)
    // Values round-trip: sentence matches, embedding parses back to the
    // exact double array the pipeline produced (double→string→double is
    // lossless; a pgvector server would narrow to float4 on cast).
    val joined = back.join(summaries.select(col("vector_id"),
        col("semantic_sentence").as("want_sentence"), col("embedding").as("want_vec")),
      "vector_id")
    assert(joined.filter(col("semantic_sentence") =!= col("want_sentence")).count() == 0)
    val reparsed = joined.select(col("vector_id"),
      split(regexp_replace(col("embedding"), "^\\[|\\]$", ""), ",")
        .cast("array<double>").as("got_vec"), col("want_vec"))
    assert(reparsed.filter(col("got_vec") =!= col("want_vec")).count() == 0)
    // Wire-format invariant: the stored literal is exactly the form a
    // real Postgres `CAST(... AS VECTOR)` consumes — bracket-delimited,
    // comma-separated numbers, no whitespace.
    assert(back.filter(!col("embedding")
      .rlike("^\\[-?[0-9]+(\\.[0-9]+)?([Ee][+-]?[0-9]+)?(,-?[0-9]+(\\.[0-9]+)?([Ee][+-]?[0-9]+)?)*\\]$"))
      .count() == 0, "stored embedding literal deviates from pgvector wire format")
  }

  test("read-back plans N parallel JDBC range splits on the persisted key hash") {
    val url = JdbcSink.memoryUrl("graft_vstore_split")
    val summaries = DailySummary.run(spark, sfDir).localCheckpoint()
    val n = summaries.count()
    VectorStore.store(summaries, url)
    val back = VectorStore.load(spark, url, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4,
      s"load collapsed to ${back.rdd.getNumPartitions} cursor(s)")
    assert(back.count() == n)
    // The splits carry real data spread, not one hot split + empties
    // (xxhash64 over 1024 buckets: 30 keys in one 256-bucket range is
    // astronomically unlikely).
    val perSplit = back.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perSplit.count(_ > 0) > 1, s"all rows in one split: ${perSplit.toSeq}")
  }

  test("replaying the same batch is idempotent; an overlap re-run updates in place") {
    val url = JdbcSink.memoryUrl("graft_vstore_idem")
    val summaries = DailySummary.run(spark, sfDir).localCheckpoint()
    val n = summaries.count()
    // Day-1 state: stale copies (the first pass of the 2-day/1-day
    // overlap loop wrote yesterday's view of each day).
    val stale = summaries.withColumn("updated_at", date_sub(col("updated_at"), 1))
    assert(VectorStore.store(stale, url) == JdbcSink.UpsertStats(0, n))
    // Overlap re-run: same keys, fresher updated_at -> all UPDATEs.
    assert(VectorStore.store(summaries, url) == JdbcSink.UpsertStats(n, 0))
    // Replay of the same batch: still n updates, table unchanged.
    assert(VectorStore.store(summaries, url) == JdbcSink.UpsertStats(n, 0))
    val back = VectorStore.load(spark, url)
    assert(back.count() == n)
    // Last write won: every stored updated_at is the fresh one.
    val fresh = summaries.select(col("vector_id"), col("updated_at").as("want"))
    assert(back.join(fresh, "vector_id")
      .filter(col("updated_at") =!= col("want")).count() == 0)
  }
}
