package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Environment-drift canary — intentionally first alphabetically so a
  * Spark / parquet-writer / testdata bump fails HERE, in one named test
  * per table, instead of as dozens of anonymous query failures.
  *
  * Round-6 lesson: the sandbox moved to Spark 4.1.2, which reads the
  * events TIMESTAMP column natively as timestamp_ntz (the legacy
  * nanosAsLong int64 path is gone), and a hard-coded BIGINT conversion
  * in Tables.load failed analysis for 43 of 100 queries, the flagship
  * entry, and the whole bench. This suite pins the POST-`Tables.load`
  * canonical schema — the contract every query is written against — so
  * the next environment drift is a one-line diff in one test name.
  */
class AAEnvCanarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def loaded(name: String) = Tables.load(spark, sfDir, name).schema

  private def assertSchema(table: String, expect: (String, DataType)*): Unit = {
    val got = loaded(table).fields.map(f => f.name -> f.dataType).toSeq
    assert(got == expect.toSeq,
      s"\n$table canonical schema drifted.\n  expected: ${expect.toSeq}\n  loaded:   $got")
  }

  test("spark version is the one every recorded hash was verified against") {
    info(s"spark=${spark.version} scala=${util.Properties.versionNumberString}")
    // Pinned on purpose: every CORRECTNESS hash and benchmark record was
    // produced on this version. On a bump this ONE named test fails —
    // re-run the oracle sweep (tools/check_oracle.py), then update the
    // pin. Verify/Bench stamp the running version into their artifacts
    // (versions.json / spark_version), so drift names itself there too.
    assert(spark.version == "4.1.2",
      s"Spark bumped to ${spark.version}: re-verify all 100 oracle hashes, then update this pin")
  }

  test("events: ts is timestamp_ntz after load (micro precision, naive)") {
    assertSchema("events",
      "event_id" -> LongType, "ts" -> TimestampNTZType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    // Values must be readable and micro-aligned: one row materializes
    // without analysis errors and renders a plausible wall-clock year.
    val r = Tables.load(spark, sfDir, "events")
      .selectExpr("min(year(ts)) as y", "count(*) as n").head()
    assert(r.getLong(1) > 0, "events is empty")
    assert(r.getInt(0) >= 2000 && r.getInt(0) <= 2100,
      s"events.ts decodes to year ${r.getInt(0)} — unit/epoch drift in the read path")
  }

  test("embeddings: embedding is array<float>") {
    assertSchema("embeddings",
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  }

  test("documents schema") {
    assertSchema("documents",
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
  }

  test("lineitem: l_shipdate is a naive timestamp") {
    assertSchema("lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType, "l_shipdate" -> TimestampNTZType)
  }

  test("orders: o_orderdate is a naive timestamp") {
    assertSchema("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)
  }

  test("dimension tables") {
    assertSchema("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertSchema("nation",
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType)
    assertSchema("customer",
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertSchema("supplier",
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType)
    assertSchema("part",
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
  }
}
