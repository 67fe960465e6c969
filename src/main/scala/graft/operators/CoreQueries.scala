package graft.operators

import graft.{NamedQuery, Tables}
import graft.NamedQuery.{q, PresentationOps}
import graft.functions.{Exact, ExactSql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator queries (SURVEY.md §2.3–§2.8).
  *
  * Each query restates a reference semantic (file:line cited per query) on
  * the driver testdata and carries a DuckDB oracle. Float aggregates go
  * through [[graft.functions.Exact]] so both engines produce bit-identical
  * doubles regardless of accumulation order — the 100 TB story is the same
  * code path: a single partial+final hash aggregate, no extra shuffle.
  */
object CoreQueries {
  import Exact.{dsum, davg}

  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")
  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")

  /** The five event types present in the generator's vocabulary. */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  val all: Seq[NamedQuery] = Seq(

    // ----- A1/A2: configurable per-column avg/max/sum over a scan
    // (reference: src/main.py:51-93 extract_field_values dispatch 82-89).
    q("q01_pricing_summary",
      "A1/A2/P2: multi-agg config over a fact scan; TPC-H Q1 shape",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${ExactSql.dsum("l_quantity")} AS sum_qty,
         |  ${ExactSql.dsum("l_extendedprice")} AS sum_base_price,
         |  ${ExactSql.dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${ExactSql.davg("l_quantity")} AS avg_qty,
         |  ${ExactSql.davg("l_extendedprice")} AS avg_price,
         |  ${ExactSql.davg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate < TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.spread(li(s, dir)
          .filter(col("l_shipdate") < lit("2001-09-01").cast("timestamp")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .presented("l_returnflag", "l_linestatus")
    },

    // ----- A1/A2 on the telemetry stand-in: the reference's agg configs
    // (gen: 3×avg+3×sum, load: 2×avg, ECRSS: max+avg — src/main.py:101-207).
    q("q02_agg_configs",
      "A1/A2: avg/max/sum per event_type (ERCOT metric configs)",
      s"""SELECT event_type,
         |  ${ExactSql.davg("value")} AS avg_value,
         |  MAX(value) AS max_value,
         |  ${ExactSql.dsum("value")} AS sum_value,
         |  COUNT(*) AS n
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      ev(s, dir).groupBy(col("event_type"))
        .agg(
          davg(col("value")).as("avg_value"),
          max(col("value")).as("max_value"),
          dsum(col("value")).as("sum_value"),
          count(lit(1)).as("n"))
        .presented("event_type")
    },

    // ----- P3/F4: date-window predicate pushed into the scan
    // (reference: SCEDTimestampFrom/To params, queries.py:66-74).
    q("q03_date_window",
      "P3/F4: pushed date-window predicate + daily agg",
      s"""SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
         |  ${ExactSql.dsum("value")} AS sum_value
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
                col("ts") <  lit("2024-01-20").cast("timestamp"))
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .presented("d")
    },

    // ----- P4/P5: equality + range predicates
    // (reference: settlementPoint equality queries.py:260,285; hourEnding
    //  range queries.py:249-253).
    q("q04_eq_range_pred",
      "P4/P5: equality + between predicates, pushed to scan",
      """SELECT event_id, user_id, value
        |FROM events
        |WHERE event_type = 'purchase' AND value BETWEEN 50 AND 200
        |  AND EXTRACT(hour FROM ts) BETWEEN 6 AND 18
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .filter(col("event_type") === "purchase" &&
                col("value").between(50, 200) &&
                hour(col("ts")).between(6, 18))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    },

    // ----- P6: enum-set validation predicate
    // (reference: service_type ∈ 9 AS enums, queries.py:233-237).
    q("q05_enum_isin",
      "P6: isin enum predicate + grouped count",
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM events WHERE event_type IN ('click','view','signup')
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .filter(col("event_type").isin("click", "view", "signup"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .presented("event_type")
    },

    // ----- P2/F11: tolerant numeric cast (bad cast → skipped, i.e. null)
    // over a JSON-extracted field (reference: float(v)-else-skip
    // src/main.py:74-79; JSON path extraction weather.py:70).
    q("q06_tolerant_cast",
      "P2/F11: try_cast + JSON field extraction, null-skipping agg",
      s"""SELECT event_type,
         |  ${ExactSql.davg("TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)")} AS avg_k,
         |  COUNT(*) - COUNT(TRY_CAST(json_extract_string(props, '$$.k') AS DOUBLE)) AS n_unparsable
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val k = expr("try_cast(get_json_object(props, '$.k') AS DOUBLE)")
      ev(s, dir).groupBy(col("event_type"))
        .agg(
          davg(k).as("avg_k"),
          (count(lit(1)) - count(k)).as("n_unparsable"))
        .presented("event_type")
    },

    // ----- P7 + the zero-fill-on-empty semantic (reference: NaN guards
    // sentence_builder.py:59-63; empty agg → 0.0 src/main.py:91).
    q("q07_null_guard_zero_fill",
      "P7/A1: null/NaN guards; empty aggregate coalesces to 0.0",
      s"""SELECT event_type,
         |  COALESCE(${ExactSql.davg("CASE WHEN value > 300 THEN value END")}, 0.0) AS avg_high,
         |  COALESCE(${ExactSql.davg("CASE WHEN value > 1000 THEN value END")}, 0.0) AS avg_impossible
         |FROM events
         |WHERE value IS NOT NULL AND NOT isnan(value)
         |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")))
        .groupBy(col("event_type"))
        .agg(
          coalesce(davg(when(col("value") > 300, col("value"))), lit(0.0)).as("avg_high"),
          coalesce(davg(when(col("value") > 1000, col("value"))), lit(0.0)).as("avg_impossible"))
        .presented("event_type")
    },

    // ----- P8: the region filter the reference declares but never applies
    // (queries.py:40,81,124,165) — done for real here, as a broadcast
    // dim-filter join: region(5 rows) and nation(25 rows) broadcast, the
    // only shuffle is the final groupBy.
    q("q08_region_filter",
      "P8/J2: region filter via broadcast dim joins",
      s"""SELECT n_name, COUNT(*) AS n_cust, ${ExactSql.dsum("c_acctbal")} AS sum_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      cust
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_acctbal"))
        .presented("n_name")
    },

    // ----- J2/J3 family: multi-way join with date window (TPC-H Q5 shape).
    // nation broadcasts; customer⋈orders and orders⋈lineitem shuffle on
    // their keys — at 100 TB those are the co-partitioned/bucketed joins.
    q("q09_multiway_join",
      "J2/J3: multiway equi-join, broadcast dims, date window",
      s"""SELECT n_name,
         |  ${ExactSql.dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val nat = Tables.load(s, dir, "nation")
      cust
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(li(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .presented("n_name")
    },

    // ----- J3: semi join (EXISTS).
    q("q10_semi_join",
      "J3: left semi join = EXISTS",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |              AND o.o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 100000)
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ----- J3: anti join (NOT EXISTS).
    q("q11_anti_join",
      "J3: left anti join = NOT EXISTS",
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // ----- J1/A3/E2: the weather-frame shape — long → wide pivot on a key,
    // then a null-skipping row-mean across the pivoted columns
    // (reference: fold of outer joins weather.py:94-97; mean(axis=1) :111).
    q("q12_pivot_row_mean",
      "J1/A3: groupBy-pivot to wide frame + null-skipping row mean",
      {
        val per = EventTypes.map { t =>
          s"  ${ExactSql.davg(s"CASE WHEN event_type = '$t' THEN value END")} AS $t"
        }.mkString(",\n")
        val sumParts = EventTypes.map(t => s"COALESCE($t, 0.0)").mkString(" + ")
        val cntParts = EventTypes.map(t => s"(CASE WHEN $t IS NOT NULL THEN 1 ELSE 0 END)").mkString(" + ")
        s"""SELECT d, click, error, purchase, signup, view,
           |  ($sumParts) / NULLIF($cntParts, 0) AS avg_all
           |FROM (
           |  SELECT CAST(ts AS DATE) AS d,
           |$per
           |  FROM events GROUP BY 1
           |) ORDER BY d""".stripMargin
      }) { (s, dir) =>
      val wide = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .pivot("event_type", EventTypes)
        .agg(davg(col("value")))
      val sumParts = EventTypes.map(t => coalesce(col(t), lit(0.0))).reduce(_ + _)
      val cntParts = EventTypes.map(t => when(col(t).isNotNull, 1).otherwise(0)).reduce(_ + _)
      wide
        .withColumn("avg_all", sumParts / nullif(cntParts, lit(0)))
        .presented("d")
    },

    // ----- J1 inverse: UNPIVOT (melt) — the wide→long reshape that
    // undoes q12's pivot, needed whenever a wide frame (one column per
    // metric/city/type) must feed a long-keyed operator (joins, windows,
    // per-key aggregation). Spark's native unpivot expands each row to
    // #value-columns rows with NO shuffle (pure projection); dropping
    // the nulls restores exactly the long frame the pivot started from,
    // which is what the oracle computes directly — the round trip is
    // the correctness claim.
    q("q72_unpivot",
      "J1/O: pivot → unpivot round trip reconstructs the long frame",
      """SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY d, event_type""".stripMargin) { (s, dir) =>
      val wide = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
      wide.unpivot(Array(col("d")), EventTypes.map(col).toArray, "event_type", "n")
        .filter(col("n").isNotNull)
        .presented("d", "event_type")
    },

    // ----- W1/T1: the reference's 2-day extent / 1-day slide window
    // (src/main.py:341-369): day d's summary aggregates [d-1, d]. Calendar
    // aligned (not epoch-aligned), expressed as an explode of each event
    // into the two windows that contain it — shuffle-equivalent to
    // window(), but matches the reference's date alignment exactly.
    q("q13_sliding_window",
      "W1/T1: sliding 2-day/1-day window daily summary",
      s"""SELECT CAST(ts AS DATE) + x AS date_to, COUNT(*) AS n_events,
         |  ${ExactSql.dsum("value")} AS sum_value,
         |  ${ExactSql.davg("value")} AS avg_value
         |FROM events CROSS JOIN (VALUES (0), (1)) t(x)
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .withColumn("x", explode(array(lit(0), lit(1))))
        .groupBy(date_add(to_date(col("ts")), col("x")).as("date_to"))
        .agg(
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"),
          davg(col("value")).as("avg_value"))
        .presented("date_to")
    },

    // ----- W2/O4: top-k per group via ranking window (generalizes the
    // reference's first-per-group `break`, meteostat_weather.py:50).
    q("q14_topk_per_group",
      "W2/O4: row_number top-k per group",
      """SELECT event_type, event_id, value, rn FROM (
        |  SELECT event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      ev(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("event_type", "event_id", "value", "rn")
        .presented("event_type", "rn")
    },

    // ----- K1: upsert as dedup-last-wins — the pgvector ON CONFLICT DO
    // UPDATE restated (pgvector_storage.py:102-105): newest row per key
    // survives. At 100 TB this is MERGE into date-partitioned storage; the
    // window-dedup is the same shuffle (hash by key) either way.
    q("q15_upsert_last_wins",
      "K1/W2: last-write-wins dedup by key",
      """SELECT user_id, ts AS updated_at, value FROM (
        |  SELECT user_id, ts, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts").as("updated_at"), col("value"))
        .orderBy("user_id")
    },

    // ----- W2 (analytic): lag/lead day-over-day deltas.
    // The unpartitioned Window.orderBy(d) is deliberate and scale-safe
    // HERE: its input is the per-day aggregate, whose cardinality is
    // #days (≈36.5k rows even for a century of data), not raw events —
    // the groupBy has already collapsed the 100 TB. A single-partition
    // sort over bounded-cardinality keys is the optimal plan; partition
    // the window only when the frame key itself is unbounded.
    q("q16_lag_lead",
      "W2: lag/lead analytic window over daily totals",
      s"""SELECT d, sum_value,
         |  sum_value - LAG(sum_value) OVER (ORDER BY d) AS delta_prev,
         |  LEAD(sum_value) OVER (ORDER BY d) - sum_value AS delta_next
         |FROM (SELECT CAST(ts AS DATE) AS d, ${ExactSql.dsum("value")} AS sum_value
         |      FROM events GROUP BY 1)
         |ORDER BY d""".stripMargin) { (s, dir) =>
      val daily = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(dsum(col("value")).as("sum_value"))
      val w = Window.orderBy(col("d"))
      daily
        .withColumn("delta_prev", col("sum_value") - lag(col("sum_value"), 1).over(w))
        .withColumn("delta_next", lead(col("sum_value"), 1).over(w) - col("sum_value"))
        .presented("d")
    },

    // ----- W2 (frame spec): running cumulative sum per group.
    q("q17_running_sum",
      "W2: cumulative frame (unbounded preceding..current)",
      """SELECT event_type, d, n,
        |  CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY d
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
        |FROM (SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |      FROM events GROUP BY 1, 2)
        |ORDER BY event_type, d""".stripMargin) { (s, dir) =>
      val daily = ev(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("running_n", sum(col("n")).over(w))
        .presented("event_type", "d")
    },

    // ----- O1/O2: global sort + limit (reference: sort_values weather.py
    // :108,114; page/size pagination queries.py:41-42). At scale Spark
    // plans this as TakeOrderedAndProject — no full sort materialized.
    q("q18_sort_limit",
      "O1/O2: order-by + limit (TakeOrderedAndProject)",
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id LIMIT 100""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .select("event_id", "event_type", "value")
        .orderBy(col("value").desc, col("event_id"))
        .limit(100)
    },

    // ----- O5: set operations (absent in reference; free family).
    q("q19_set_ops",
      "O5: union / intersect / except with distinct semantics",
      """SELECT 'both' AS tag, user_id FROM
        |  (SELECT user_id FROM events WHERE event_type = 'click'
        |   INTERSECT
        |   SELECT user_id FROM events WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT 'click_only' AS tag, user_id FROM
        |  (SELECT user_id FROM events WHERE event_type = 'click'
        |   EXCEPT
        |   SELECT user_id FROM events WHERE event_type = 'purchase')
        |ORDER BY tag, user_id""".stripMargin) { (s, dir) =>
      val clicks = ev(s, dir).filter(col("event_type") === "click").select("user_id")
      val buys = ev(s, dir).filter(col("event_type") === "purchase").select("user_id")
      clicks.intersect(buys).select(lit("both").as("tag"), col("user_id"))
        .unionAll(clicks.except(buys).select(lit("click_only").as("tag"), col("user_id")))
        .orderBy("tag", "user_id")
    },

    // ----- A7: first-per-group, deterministic order (reference: first
    // non-NaN per city, meteostat_weather.py:46-50).
    q("q20_first_per_group",
      "A7: first value per group by explicit order",
      """SELECT user_id, ts AS first_ts, value AS first_value FROM (
        |  SELECT user_id, ts, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE value IS NOT NULL)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .filter(col("value").isNotNull)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts").as("first_ts"), col("value").as("first_value"))
        .orderBy("user_id")
    },

    // ----- A8: rollup grouping sets + distinct agg (absent in reference;
    // free via Catalyst Expand).
    q("q21_rollup",
      "A8: rollup with grouping() + countDistinct",
      """SELECT event_type, CAST(ts AS DATE) AS d,
        |  CAST(GROUPING(event_type) AS INT) AS g_type,
        |  CAST(GROUPING(CAST(ts AS DATE)) AS INT) AS g_d,
        |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
        |ORDER BY g_type, g_d, event_type NULLS FIRST, d NULLS FIRST""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .withColumn("d", to_date(col("ts")))
        .rollup(col("event_type"), col("d"))
        .agg(
          grouping(col("event_type")).cast("int").as("g_type"),
          grouping(col("d")).cast("int").as("g_d"),
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .select("event_type", "d", "g_type", "g_d", "n", "n_users")
        .presented(col("g_type"), col("g_d"),
          col("event_type").asc_nulls_first, col("d").asc_nulls_first)
    },

    // ----- F4: date-spine generation + zero-filled left join (reference:
    // timedelta day-stepping, src/main.py:291-303,343-369).
    q("q22_date_spine",
      "F4/J2: sequence() date spine, left join, zero-fill",
      s"""SELECT d, COALESCE(n, 0) AS n, COALESCE(sum_value, 0.0) AS sum_value
         |FROM (SELECT CAST(gs AS DATE) AS d
         |      FROM generate_series(DATE '2023-12-28', DATE '2024-02-02',
         |                           INTERVAL 1 DAY) t(gs)) spine
         |LEFT JOIN (SELECT CAST(ts AS DATE) AS ed, COUNT(*) AS n,
         |                  ${ExactSql.dsum("value")} AS sum_value
         |           FROM events GROUP BY 1) agg ON spine.d = agg.ed
         |ORDER BY d""".stripMargin) { (s, dir) =>
      val spine = s.range(1).select(explode(sequence(
        to_date(lit("2023-12-28")), to_date(lit("2024-02-02")))).as("d"))
      val agg = ev(s, dir)
        .groupBy(to_date(col("ts")).as("ed"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      spine.join(agg, spine("d") === agg("ed"), "left_outer")
        .select(col("d"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .presented("d")
    }
  )
}
