package graft

import graft.sinks.JdbcSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-connection K1/K2 semantics against embedded Derby: DDL
  * idempotence, distributed batch insert, update-else-insert upsert
  * (last write wins, new keys inserted), partitioned read-back. */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshUrl(tag: String): String = JdbcSink.memoryUrl(s"graft_spec_$tag")

  test("insert appends through Spark's JDBC writer; partitioned read returns every row") {
    val url = freshUrl("insert")
    JdbcSink.recreateTable(url, "t", "k BIGINT NOT NULL PRIMARY KEY, v DOUBLE")
    val df = spark.range(1, 101).select($"id".as("k"), ($"id" * 2.0).as("v"))
      .repartition(4) // multiple writer partitions → multiple connections
    JdbcSink.insert(df, url, "t")
    val back = JdbcSink.read(spark, url, "t", "k", 1L, 101L, 4)
    assert(back.rdd.getNumPartitions == 4) // range splits, not one cursor
    assert(back.count() == 100)
    assert(back.agg(sum("V")).head().getDouble(0) == (1 to 100).map(_ * 2.0).sum)
  }

  test("upsert updates existing keys and inserts new ones, transactionally batched") {
    val url = freshUrl("upsert")
    JdbcSink.recreateTable(url, "t", "k BIGINT NOT NULL PRIMARY KEY, v DOUBLE, s VARCHAR(32)")
    JdbcSink.insert(Seq((1L, 1.0, "a"), (2L, 2.0, "b"), (3L, 3.0, "c")).toDF("k", "v", "s"), url, "t")
    val stats = JdbcSink.upsert(
      Seq((2L, 20.0, "B"), (3L, 30.0, "C"), (9L, 9.0, "i")).toDF("k", "v", "s"),
      url, "t", "k", batchSize = 2)
    assert(stats == JdbcSink.UpsertStats(updated = 2, inserted = 1))
    val got = JdbcSink.read(spark, url, "t", "k", 1L, 10L, 2)
      .select($"K".as("k"), $"V".as("v"), $"S".as("s"))
      .as[(Long, Double, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1.0, "a"), (2L, 20.0, "B"), (3L, 30.0, "C"), (9L, 9.0, "i")))
  }

  test("upsert is idempotent: replaying the same batch changes nothing") {
    val url = freshUrl("idem")
    JdbcSink.recreateTable(url, "t", "k BIGINT NOT NULL PRIMARY KEY, v DOUBLE")
    val batch = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    JdbcSink.upsert(batch, url, "t", "k")
    val second = JdbcSink.upsert(batch, url, "t", "k")
    assert(second == JdbcSink.UpsertStats(updated = 2, inserted = 0))
    val got = JdbcSink.read(spark, url, "t", "k", 1L, 3L, 1)
      .select($"K", $"V").as[(Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10.0), (2L, 20.0)))
  }

  test("upsert carries NULL values through both the update and insert paths") {
    val url = freshUrl("nulls")
    JdbcSink.recreateTable(url, "t", "k BIGINT NOT NULL PRIMARY KEY, v DOUBLE, s VARCHAR(32)")
    JdbcSink.insert(Seq((1L, Some(1.0), Some("a"))).toDF("k", "v", "s"), url, "t")
    val stats = JdbcSink.upsert(
      Seq((1L, None, Some("A")), (2L, Some(2.0), None))
        .toDF("k", "v", "s"), url, "t", "k")
    assert(stats == JdbcSink.UpsertStats(updated = 1, inserted = 1))
    val got = JdbcSink.read(spark, url, "t", "k", 1L, 3L, 1)
      .select($"K".as("k"), $"V".as("v"), $"S".as("s"))
      .as[(Long, Option[Double], Option[String])].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, None, Some("A")), (2L, Some(2.0), None)))
  }

  test("upsert tolerates the same key twice in one batch, across input partitions") {
    // The reference's 1-day-overlap reprocessing can emit one key twice in
    // a batch. Landing those rows in different writer partitions must not
    // race to a duplicate-key violation: upsert co-locates each key, so
    // the copies apply serially (insert, then update) and one row remains.
    val url = freshUrl("dupkey")
    JdbcSink.recreateTable(url, "t", "k BIGINT NOT NULL PRIMARY KEY, v DOUBLE")
    val dup = Seq((42L, 7.0), (42L, 7.0), (1L, 1.0)).toDF("k", "v").repartition(3)
    val stats = JdbcSink.upsert(dup, url, "t", "k")
    assert(stats.updated + stats.inserted == 3) // every row applied, none aborted
    val got = JdbcSink.read(spark, url, "t", "k", 1L, 43L, 1)
      .select($"K", $"V").as[(Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1.0), (42L, 7.0)))
  }

  test("recreateTable is idempotent and drops prior state") {
    val url = freshUrl("ddl")
    JdbcSink.recreateTable(url, "t", "k BIGINT NOT NULL PRIMARY KEY, v DOUBLE")
    JdbcSink.insert(Seq((1L, 1.0)).toDF("k", "v"), url, "t")
    JdbcSink.recreateTable(url, "t", "k BIGINT NOT NULL PRIMARY KEY, v DOUBLE")
    assert(JdbcSink.read(spark, url, "t", "k", 1L, 2L, 1).count() == 0)
  }
}
