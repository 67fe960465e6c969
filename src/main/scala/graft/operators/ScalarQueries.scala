package graft.operators

import graft.{NamedQuery, Tables}
import graft.NamedQuery.{q, PresentationOps}
import graft.functions.{Exact, ExactSql, SentenceOps}
import org.apache.spark.sql.functions._

/** Scalar-function library queries (SURVEY.md §2.8 F1–F16).
  *
  * Everything here is pure column expressions — deliberately no UDFs, so
  * the whole stage stays inside WholeStageCodegen (reference's sentence
  * builder is re-expressed columnar per SURVEY U2).
  */
object ScalarQueries {
  import Exact.{davg, dsum}

  val all: Seq[NamedQuery] = Seq(

    // ----- F4–F9: date parse/format/arith, unit conversions, rounding,
    // ID synthesis (reference: °C→°F weather.py:112; /96 SCED derivation
    // sentence_builder.py:46-48; round(·,2) main.py:207; vector_id
    // synthesis sentence_builder.py:148).
    q("q23_scalar_derivations",
      "F4-F9/A5: derived post-aggregates, conversions, id synthesis",
      s"""SELECT
         |  strftime(d, '%Y-%m-%d') AS date_str,
         |  'daily_summary_' || strftime(d, '%Y-%m-%d') AS vector_id,
         |  temp_c, temp_c * 9 / 5 + 32 AS temp_f,
         |  sum_value / 96 AS per_interval_avg,
         |  ROUND(avg_purchase, 2) AS avg_purchase_r2,
         |  CASE WHEN sum_value > 0
         |       THEN sum_click / sum_value * 100 ELSE NULL END AS click_pct
         |FROM (
         |  SELECT CAST(ts AS DATE) AS d,
         |    ${ExactSql.davg("value")} / 10 AS temp_c,
         |    ${ExactSql.dsum("value")} AS sum_value,
         |    ${ExactSql.davg("CASE WHEN event_type = 'purchase' THEN value END")} AS avg_purchase,
         |    ${ExactSql.dsum("CASE WHEN event_type = 'click' THEN value END")} AS sum_click
         |  FROM events GROUP BY 1)
         |ORDER BY date_str""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(to_date(col("ts")).as("d"))
        .agg(
          (davg(col("value")) / 10).as("temp_c"),
          dsum(col("value")).as("sum_value"),
          davg(when(col("event_type") === "purchase", col("value"))).as("avg_purchase"),
          dsum(when(col("event_type") === "click", col("value"))).as("sum_click"))
        .select(
          date_format(col("d"), "yyyy-MM-dd").as("date_str"),
          concat(lit("daily_summary_"), date_format(col("d"), "yyyy-MM-dd")).as("vector_id"),
          col("temp_c"),
          (col("temp_c") * 9 / 5 + 32).as("temp_f"),
          (col("sum_value") / 96).as("per_interval_avg"),
          round(col("avg_purchase"), 2).as("avg_purchase_r2"),
          when(col("sum_value") > 0, col("sum_click") / col("sum_value") * 100)
            .otherwise(lit(null)).as("click_pct"))
        .presented("date_str")
    },

    // ----- F1/F2: the semantic-sentence renderer — labeled metric lines
    // joined by newline, null → "N/A" (reference:
    // sentence_builder.py:32-38,71-100; golden RELEVANT_ERCOT_APIS.md:57-69).
    q("q24_semantic_sentence",
      "F1/F2/U2: columnar semantic-sentence template with N/A fallback",
      SentenceOps.oracleSql) { (s, dir) =>
      SentenceOps.dailySentences(Tables.load(s, dir, "events"))
    },

    // ----- P9/F10/F12/F15: existence projection with rename, JSON
    // serialization, decimal coercion w/ 0 fallback (reference: dynamodb
    // flatten :100-137, raw_json :140, Decimal :85-97).
    q("q25_flatten_project",
      "P9/F10/F12/F15: flatten + rename + decimal coercion + to_json",
      """SELECT
        |  'evt_' || CAST(event_id AS VARCHAR) AS item_id,
        |  event_type AS doc_type,
        |  CAST(COALESCE(TRY_CAST(value AS DECIMAL(18,2)), 0) AS DOUBLE) AS efficiency,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
        |  (json_extract_string(props, '$.k') IS NOT NULL) AS has_k,
        |  CAST(to_json(struct_pack(event_id := event_id,
        |                           event_type := event_type)) AS VARCHAR) AS raw_json,
        |  substring(CAST(to_json(struct_pack(event_id := event_id,
        |                           event_type := event_type)) AS VARCHAR), 1, 24) AS raw_json_trunc
        |FROM events ORDER BY item_id LIMIT 1000""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(
          concat(lit("evt_"), col("event_id").cast("string")).as("item_id"),
          col("event_type").as("doc_type"),
          coalesce(expr("try_cast(value AS DECIMAL(18,2))"), lit(0))
            .cast("double").as("efficiency"),
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k_value"),
          get_json_object(col("props"), "$.k").isNotNull.as("has_k"),
          to_json(struct(col("event_id"), col("event_type"))).as("raw_json"),
          // O3: bounded log/diagnostic truncation (reference: json.dumps(...)[:500],
          // main.py:114 — 24 chars here so the cut is visible on test rows)
          substring(to_json(struct(col("event_id"), col("event_type"))), 1, 24)
            .as("raw_json_trunc"))
        // orderBy + limit plans TakeOrderedAndProject: parallel per-partition
        // top-k, no full sort, no single-task exchange — the whole events
        // table never funnels through one partition.
        .orderBy("item_id")
        .limit(1000)
    }
  )
}
