package graft.operators

import graft.{NamedQuery, Tables}
import graft.NamedQuery.{q, PresentationOps}
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
        .presented("n_name", "o_year")
    },

    // ----- S1/S2 as a real connector: the custom DataSourceV2 source
    // standing in for the paginated ERCOT REST scan — partition-per-page
    // parallelism, pruned columns, and the settlement_point equality
    // pushed into the reader (the "request param" analog). The oracle
    // mirrors the deterministic feed with a range() generator.
    q("q46_dsv2_source",
      "S1/S2: DataSourceV2 paged scan, pushed filter, daily rollup",
      s"""WITH feed AS (
         |  SELECT TIMESTAMP '2024-01-01 00:00:00'
         |           + (i // 96) * INTERVAL 1 DAY
         |           + (i % 96) * INTERVAL 15 MINUTE AS ts,
         |         ['HB_HUBAVG','HB_NORTH','HB_SOUTH','HB_WEST','HB_HOUSTON'][CAST(i % 5 AS INT) + 1] AS settlement_point,
         |         (i * 31 % 1000) / 10.0 AS price,
         |         (i * 17 % 5000) / 10.0 AS mw
         |  FROM (SELECT unnest(range(0, 576)) AS i))
         |SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
         |  ${ExactSql.davg("price")} AS avg_price, MAX(mw) AS max_mw
         |FROM feed WHERE settlement_point = 'HB_HUBAVG'
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // full class name: resolves without the META-INF service file, so
      // the query works even off a bare-compiled classes dir (the
      // "ercot-pages" short name needs copied resources)
      s.read.format("graft.sources.ErcotPagesSource")
        .option("pages", 6).option("pageSize", 96)
        .option("startDate", "2024-01-01")
        .load()
        .filter(col("settlement_point") === "HB_HUBAVG") // pushed to the reader
        .groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("n"),
          Exact.davg(col("price")).as("avg_price"),
          max(col("mw")).as("max_mw"))
        .presented("d")
    },

    // ----- E2 end-to-end: the reference's hourly weather-frame
    // lifecycle as ONE query (weather.py:37-165): long (time, city,
    // temp) → wide pivot → null-skipping row mean (A3) → °F (F6) → sort
    // by time (O1) → rename time→timestamp (F15) → schema-intersect to
    // the sink columns (F16). event_type plays the city column; value/10
    // plays °C. The pivot is a single hash-agg shuffle; everything after
    // is projection.
    q("q47_weather_frame",
      "E2/J1/A3/F6/F15/F16: long→wide hourly frame, row mean, °F, sink projection",
      {
        val types = CoreQueries.EventTypes
        val cells = types.map { t =>
          s"  ${ExactSql.davg(s"CASE WHEN event_type = '$t' THEN value END")} / 10 AS $t"
        }.mkString(",\n")
        val sumParts = types.map(t => s"COALESCE($t, 0.0)").mkString(" + ")
        val cntParts = types.map(t => s"(CASE WHEN $t IS NOT NULL THEN 1 ELSE 0 END)").mkString(" + ")
        s"""SELECT "timestamp", ${types.mkString(", ")},
           |  avg_temperature_c,
           |  avg_temperature_c * 9 / 5 + 32 AS avg_temperature_f
           |FROM (
           |  SELECT "timestamp", ${types.mkString(", ")},
           |    ($sumParts) / NULLIF($cntParts, 0) AS avg_temperature_c
           |  FROM (
           |    SELECT date_trunc('hour', ts) AS "timestamp",
           |$cells
           |    FROM events
           |    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'
           |    GROUP BY 1))
           |ORDER BY "timestamp"""".stripMargin
      }) { (s, dir) =>
      val types = CoreQueries.EventTypes
      val wide = Tables.load(s, dir, "events")
        .filter(col("ts") >= lit("2024-01-05").cast("timestamp") &&
                col("ts") <  lit("2024-01-12").cast("timestamp"))
        .groupBy(date_trunc("hour", col("ts")).as("time"))
        .pivot("event_type", types)
        .agg(Exact.davg(col("value")) / 10)
      val sumParts = types.map(t => coalesce(col(t), lit(0.0))).reduce(_ + _)
      val cntParts = types.map(t => when(col(t).isNotNull, 1).otherwise(0)).reduce(_ + _)
      val framed = wide
        .withColumn("avg_temperature_c", sumParts / nullif(cntParts, lit(0)))
        .withColumn("avg_temperature_f", col("avg_temperature_c") * 9 / 5 + 32)
        .withColumn("debug_rowid", monotonically_increasing_id()) // dropped by the sink projection
        .presented("time")
        .withColumnRenamed("time", "timestamp")
      Upsert.schemaIntersect(framed,
        Seq("timestamp") ++ types ++ Seq("avg_temperature_c", "avg_temperature_f"))
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
