package graft.operators

import graft.{NamedQuery, Tables}
import graft.NamedQuery.q
import graft.functions.{Exact, ExactSql}
import org.apache.spark.sql.functions._

/** Pipeline-shaped queries: multi-dimension join rollups and sink-side
  * projections (SURVEY.md §2.2/§2.8 K-family, F15/F16).
  */
object PipelineQueries {
  import Exact.dsum

  /** The fixed sink schema a weather-table-style DDL would declare
    * (reference: create_weather_table.py:51-63 — a TIMESTAMP key plus
    * measure columns; extra frame columns must be dropped before insert,
    * weather.py:137-140). */
  val SinkColumns: Seq[String] = Seq("timestamp", "user_id", "value")

  val all: Seq[NamedQuery] = Seq(

    // ----- J3/A1 closing table coverage: part+supplier+nation 3-dim
    // rollup (TPC-H Q9 shape, profit = revenue − synthetic cost basis).
    // Dims (part, supplier, nation) broadcast; the only big shuffle is
    // the final groupBy — at 100 TB part/supplier stop being
    // broadcastable and become bucketed co-partitioned joins on the same
    // keys, with an identical logical plan.
    q("q37_part_supplier_profit",
      "J3/A1: fact × 3 dims star join, profit rollup by nation × year",
      s"""SELECT n_name, CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year,
         |  ${ExactSql.dsum("l_extendedprice * (1 - l_discount) - 0.8 * p_retailprice * l_quantity")} AS profit,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_brand LIKE 'Brand#1%'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val part = Tables.load(s, dir, "part").filter(col("p_brand").like("Brand#1%"))
      val supp = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      li
        .join(broadcast(part), col("p_partkey") === col("l_partkey"))
        .join(broadcast(supp), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("l_shipdate")).as("o_year"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
            lit(0.8) * col("p_retailprice") * col("l_quantity")).as("profit"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name", "o_year")
    },

    // ----- F15/F16: the sink projection path — standardize column names
    // (time→timestamp, reference weather.py:128) then schema-intersect
    // against the sink's declared columns (weather.py:137-140) so extra
    // frame columns never reach the insert. Column pruning pushes the
    // projection into the scan (only 3 of 5 columns read).
    q("q38_sink_projection",
      "F15/F16: rename-standardize + schema-intersect sink projection",
      """SELECT ts AS "timestamp", user_id, value
        |FROM events""".stripMargin) { (s, dir) =>
      val renamed = Tables.load(s, dir, "events")
        .withColumnRenamed("ts", "timestamp")
        .withColumn("derived_junk", lit("not for the sink"))
      Upsert.schemaIntersect(renamed, SinkColumns)
    }
  )
}
