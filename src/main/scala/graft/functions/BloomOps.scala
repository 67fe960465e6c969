package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{col, lit}

/** Column API over Spark's native Bloom-filter expressions (the same
  * codegen'd machinery the optimizer injects for runtime join filters,
  * surfaced for EXPLICIT pre-filtering). The 100 TB use: build a
  * compact sketch of the SMALL side's join keys once, ship it to every
  * task as a literal (exactly how Spark materializes an injected
  * runtime filter's scalar subquery), and drop non-matching rows from
  * the BIG side map-side — before they reach the shuffle. No false
  * negatives, so an exact equi-join downstream returns precisely the
  * unfiltered result while the exchange carries a fraction of the rows.
  *
  * Native expressions, not UDFs: `might_contain` stays inside
  * WholeStageCodegen on the hot path.
  */
object BloomOps {

  /** Aggregate a LongType column into a serialized Bloom filter
    * (one binary row). */
  def bloomAgg(items: Column, estimatedItems: Long): Column =
    GraftSql.column(
      new BloomFilterAggregate(GraftSql.expression(items), estimatedItems)
        .toAggregateExpression())

  /** Build the sketch and return it driver-side, ready to inline with
    * [[mightContain]] — the explicit form of a runtime filter's
    * materialized scalar subquery. One tiny row crosses the driver,
    * never the data. */
  def build(keys: DataFrame, keyCol: String, estimatedItems: Long): Array[Byte] =
    keys.agg(bloomAgg(col(keyCol), estimatedItems).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Probe: `might_contain(bloom, value)` with the sketch inlined as a
    * BinaryType literal (the expression requires a constant/scalar
    * bloom side by design). */
  def mightContain(bloom: Array[Byte], value: Column): Column =
    GraftSql.column(
      BloomFilterMightContain(GraftSql.expression(lit(bloom)), GraftSql.expression(value)))
}
