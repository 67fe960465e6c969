package graft.functions

import graft.NamedQuery.PresentationOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's "semantic sentence" renderer, re-expressed columnar.
  *
  * Reference: src/services/sentence_builder.py:12-100 renders one
  * structured multi-line string per day (golden example at
  * RELEVANT_ERCOT_APIS.md:57-69), with `None → "N/A"` metric formatting
  * (sentence_builder.py:32-38). Here it is pure `format_string` /
  * `concat_ws` column algebra — no UDF, so it stays inside
  * WholeStageCodegen and runs at scan speed on any cluster size.
  *
  * Metric mapping onto the telemetry stand-in (FIXTURES.md §B): view →
  * system load, signup → telemetry generation, purchase → DAM price,
  * click/error → wind/solar, value/10 → temperature.
  */
object SentenceOps {

  /** format with unit, null → "N/A" (reference sentence_builder.py:32-38).
    * The value is ROUNDED at the format precision before formatting:
    * Spark's format_string (Java, HALF_UP) and DuckDB's printf (C,
    * half-even on the binary value) disagree on exact .x5 doubles
    * (e.g. 102.25 → "102.3" vs "102.2"); rounding first (identical
    * HALF-UP/away-from-zero in both engines) removes the tie before the
    * formatter ever sees it. */
  def fmtMetric(c: Column, fmt: String, precision: Int): Column =
    when(c.isNotNull, format_string(fmt, round(c, precision))).otherwise(lit("N/A"))

  private def typedAvg(t: String) =
    Exact.davg(when(col("event_type") === t, col("value")))

  /** Daily metrics → one multi-line semantic sentence per day. */
  def dailySentences(events: DataFrame): DataFrame =
    renderDaily(dailyMetrics(events)
      .withColumn("temp_c", col("temp_c_inline")))

  /** The daily weather dimension `(d, temp_c)` the reference keeps as a
    * separate source (meteostat daily mean, main.py:290-303) — derived
    * here from the same telemetry the inline path folds, so the joined
    * and inline renders are bit-identical. */
  def dailyWeatherDim(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("d"))
      .agg((Exact.davg(col("value")) / 10).as("temp_c"))

  /** E1's structurally-faithful form: daily metrics LEFT-joined to a
    * broadcast weather dimension before the sentence render (the
    * reference attaches the day's weather scalar to the summary dict,
    * main.py:290-303, and the builder renders it,
    * sentence_builder.py:126-127). A missing day in the dim renders
    * "N/A" — the reference's None → N/A rule. */
  def dailySentencesWithWeather(events: DataFrame, weatherDim: DataFrame): DataFrame =
    renderDaily(dailyMetrics(events)
      .join(broadcast(weatherDim), Seq("d"), "left"))

  /** Shared daily aggregate (everything but the weather column; the
    * inline temperature travels as `temp_c_inline` so the two entry
    * paths pick their source explicitly). */
  private def dailyMetrics(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(
        typedAvg("view").as("load_mw"),
        typedAvg("signup").as("gen_mw"),
        round(typedAvg("purchase"), 2).as("price"),
        typedAvg("click").as("wind_mw"),
        typedAvg("error").as("solar_mw"),
        max(when(col("value") > 320, col("value"))).as("max_offer"),
        (Exact.davg(col("value")) / 10).as("temp_c_inline"))
      .withColumn("renew_pct",
        when(col("gen_mw") > 0,
          (col("wind_mw") + col("solar_mw")) / col("gen_mw") * 100))

  private def renderDaily(daily: DataFrame): DataFrame = {
    daily.select(
      date_format(col("d"), "yyyy-MM-dd").as("date_str"),
      concat(lit("daily_summary_"), date_format(col("d"), "yyyy-MM-dd")).as("vector_id"),
      concat_ws("\n",
        lit("ISO: ERCOT"),
        concat(lit("Date_from: "), date_format(date_sub(col("d"), 1), "yyyy-MM-dd")),
        concat(lit("Date_to: "), date_format(col("d"), "yyyy-MM-dd")),
        concat(lit("Avg system load: "), fmtMetric(col("load_mw"), "%.1f MW", 1)),
        concat(lit("Telemetry generation: "), fmtMetric(col("gen_mw"), "%.1f MW", 1)),
        concat(lit("DAM HubAvg price: "), fmtMetric(col("price"), "%.2f USD/MWh", 2)),
        concat(lit("Renewables: "),
          fmtMetric(col("wind_mw"), "wind %.1f MW", 1), lit(", "),
          fmtMetric(col("solar_mw"), "solar %.1f MW", 1), lit(", "),
          fmtMetric(col("renew_pct"), "%.1f%% of generation", 1)),
        concat(lit("ECRSS max offer: "), fmtMetric(col("max_offer"), "%.1f MW", 1)),
        concat(lit("Avg Texas temperature: "), fmtMetric(col("temp_c"), "%.1f C", 1)))
        .as("semantic_sentence"))
      .presented("date_str")
  }

  /** DuckDB mirror of [[dailySentences]]. */
  val oracleSql: String = {
    def tAvg(t: String) =
      ExactSql.davg(s"CASE WHEN event_type = '$t' THEN value END")
    // ROUND-before-printf mirrors fmtMetric (see its scaladoc).
    def fmt(c: String, f: String) = {
      val p = if (f.contains("%.2f")) 2 else 1
      s"CASE WHEN $c IS NOT NULL THEN printf('$f', ROUND($c, $p)) ELSE 'N/A' END"
    }
    s"""SELECT date_str, 'daily_summary_' || date_str AS vector_id,
       |  concat_ws(chr(10),
       |    'ISO: ERCOT',
       |    'Date_from: ' || strftime(d - 1, '%Y-%m-%d'),
       |    'Date_to: ' || date_str,
       |    'Avg system load: ' || ${fmt("load_mw", "%.1f MW")},
       |    'Telemetry generation: ' || ${fmt("gen_mw", "%.1f MW")},
       |    'DAM HubAvg price: ' || ${fmt("price", "%.2f USD/MWh")},
       |    'Renewables: ' || ${fmt("wind_mw", "wind %.1f MW")} || ', '
       |      || ${fmt("solar_mw", "solar %.1f MW")} || ', '
       |      || ${fmt("renew_pct", "%.1f%% of generation")},
       |    'ECRSS max offer: ' || ${fmt("max_offer", "%.1f MW")},
       |    'Avg Texas temperature: ' || ${fmt("temp_c", "%.1f C")}
       |  ) AS semantic_sentence
       |FROM (
       |  SELECT *, strftime(d, '%Y-%m-%d') AS date_str,
       |    CASE WHEN gen_mw > 0 THEN (wind_mw + solar_mw) / gen_mw * 100 END AS renew_pct
       |  FROM (
       |    SELECT CAST(ts AS DATE) AS d,
       |      ${tAvg("view")} AS load_mw,
       |      ${tAvg("signup")} AS gen_mw,
       |      ROUND(${tAvg("purchase")}, 2) AS price,
       |      ${tAvg("click")} AS wind_mw,
       |      ${tAvg("error")} AS solar_mw,
       |      MAX(CASE WHEN value > 320 THEN value END) AS max_offer,
       |      ${ExactSql.davg("value")} / 10 AS temp_c
       |    FROM events GROUP BY 1))
       |ORDER BY date_str""".stripMargin
  }
}
