package graft

import graft.functions.SentenceOps
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the semantic-sentence format against a hand-computed golden
  * string (reference format: RELEVANT_ERCOT_APIS.md:57-69, renderer
  * src/services/sentence_builder.py:71-100), including the `None → N/A`
  * path (sentence_builder.py:32-38). */
class SentenceOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("golden sentence for a fully-populated day, N/A for a missing metric") {
    val events = Seq(
      (ts("2024-01-02 12:00:00"), "view", 100.0),
      (ts("2024-01-02 12:05:00"), "signup", 200.0),
      (ts("2024-01-02 12:10:00"), "purchase", 55.125),
      (ts("2024-01-02 12:15:00"), "click", 40.0),
      (ts("2024-01-02 12:20:00"), "error", 10.0)
    ).toDF("ts", "event_type", "value")

    val row = SentenceOps.dailySentences(events).collect().head
    assert(row.getAs[String]("date_str") == "2024-01-02")
    assert(row.getAs[String]("vector_id") == "daily_summary_2024-01-02")
    val expected = Seq(
      "ISO: ERCOT",
      "Date_from: 2024-01-01",
      "Date_to: 2024-01-02",
      "Avg system load: 100.0 MW",
      "Telemetry generation: 200.0 MW",
      "DAM HubAvg price: 55.13 USD/MWh",
      "Renewables: wind 40.0 MW, solar 10.0 MW, 25.0% of generation",
      "ECRSS max offer: N/A", // no value > 320 → null → N/A
      "Avg Texas temperature: 8.1 C" // avg(405.125/5)/10 = 8.1025
    ).mkString("\n")
    assert(row.getAs[String]("semantic_sentence") == expected)
  }

  test("weather-dim join render ≡ inline render; missing day renders N/A") {
    val events = Seq(
      (ts("2024-01-02 12:00:00"), "view", 100.0),
      (ts("2024-01-02 12:05:00"), "signup", 200.0),
      (ts("2024-01-03 09:00:00"), "view", 50.0),
      (ts("2024-01-03 10:00:00"), "purchase", 61.5)
    ).toDF("ts", "event_type", "value")
    val inline = SentenceOps.dailySentences(events)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    val joined = SentenceOps
      .dailySentencesWithWeather(events, SentenceOps.dailyWeatherDim(events))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(joined == inline, "joined render diverges from the inline render")
    // A day absent from the dimension renders the reference's N/A.
    val partialDim = SentenceOps.dailyWeatherDim(
      events.filter(col("ts") < lit("2024-01-03").cast("timestamp")))
    val withGap = SentenceOps.dailySentencesWithWeather(events, partialDim)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(withGap("2024-01-03").contains("Avg Texas temperature: N/A"))
    assert(withGap("2024-01-02") == inline("2024-01-02"))
  }

  test("renderer is total: a day with only one event type still renders") {
    val events = Seq((ts("2024-03-05 01:00:00"), "view", 12.5))
      .toDF("ts", "event_type", "value")
    val s = SentenceOps.dailySentences(events).collect().head
      .getAs[String]("semantic_sentence")
    assert(s.contains("Avg system load: 12.5 MW"))
    assert(s.contains("Telemetry generation: N/A"))
    assert(s.contains("Renewables: N/A, N/A, N/A"))
    assert(s.linesIterator.size == 9)
  }

  test("fmtMetric formats non-null and falls back to N/A") {
    val df = Seq((Some(3.14159), 1), (None, 2)).toDF("v", "id")
      .select(SentenceOps.fmtMetric(col("v"), "%.2f MW", 2).as("s"), col("id"))
      .orderBy("id")
    assert(df.as[(String, Int)].collect().toSeq ==
      Seq(("3.14 MW", 1), ("N/A", 2)))
  }
}
