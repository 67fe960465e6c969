package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.net.http.{HttpRequest, HttpResponse}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Connection settings for the live hourly-weather scan (reference
  * `src/data/weather_api/weather.py:20-36`: API key + base URL, key
  * travels as the `key` request param). `toString` redacts the key. */
final case class WeatherConf(baseUrl: String, apiKey: String) {
  override def toString: String = s"WeatherConf($baseUrl, apiKey=***)"
}

/** One hourly reading in the LONG shape the E2 pivot consumes
  * (weather.py:70-74 builds exactly (time, city→temp_c) per city). */
final case class HourlyTemp(time: String, city: String, temp_c: Double)

/** Result of a fan-out fetch: the long frame plus the EXACT count of
  * cities skipped after their retry budget (the reference logs-and-
  * skips a failing city rather than failing the day, weather.py:79-89
  * — at scale that MUST be surfaced as a metric, not buried in a
  * log). The frame is MATERIALIZED (localCheckpoint) before this
  * returns: a lazy frame would re-run the whole HTTP fan-out on every
  * action, burning the API budget. The count is aggregated from the
  * checkpointed status rows (see [[FanOut]]), not an accumulator, so
  * task retries never over-count it. */
final case class WeatherFetch(frame: Dataset[HourlyTemp], skippedCities: Long)

/** A retryable city-fetch failure, named for the city so an exhausted
  * budget is attributable in executor logs. */
final class TransientCityError(city: String, attempt: Int)
  extends RuntimeException(s"transient fault fetching weather for $city (attempt $attempt)")
  with TransientFault

/** Live WeatherAPI hourly scan (SURVEY §2.1 S3; reference
  * weather.py:37-97): per-city GET `?key&q&dt`, decode
  * `forecast.forecastday[0].hour[].{time,temp_c}`.
  *
  * The reference loops cities on one thread; here the city list is a
  * Dataset repartitioned city-per-task, so a 500-city fetch runs with
  * 500-way parallelism — the same partition-per-unit design as the
  * paginated report scan. Transient faults (429/5xx) ride the shared
  * bounded-backoff [[RetryPolicy]]; a city that exhausts its budget is
  * skipped and counted, everything else lands. The long output feeds
  * the spec-proven E2 lifecycle (pivot → row mean → °F, q12/q47)
  * unchanged. */
object WeatherHttpClient {

  private val mapper = new ObjectMapper() // thread-safe once configured

  def fetchHourly(spark: SparkSession, conf: WeatherConf, date: String,
      locations: Seq[(String, String)], retry: RetryConf): WeatherFetch = {
    import spark.implicits._
    val fetch = FanOut.fetch(spark, locations, retry) {
      (name, cityId, attempt) => fetchCity(conf, date, name, cityId, attempt).iterator
    }
    WeatherFetch(fetch.frame, fetch.skipped)
  }

  /** One authenticated GET for one city; 429/5xx → transient (retried
    * by the caller's policy), anything else non-200 → hard error (the
    * caller skips the city, as the reference does on HTTPError). A 200
    * whose body lacks the forecastday shape ALSO throws: a city must
    * never silently vanish with the skip metric unincremented. */
  private def fetchCity(conf: WeatherConf, date: String, name: String,
      cityId: String, attempt: Int): Seq[HourlyTemp] = {
    val uri = URI.create(s"${conf.baseUrl}?key=${HttpPageClient.enc(conf.apiKey)}" +
      s"&q=${HttpPageClient.enc(cityId)}&dt=${HttpPageClient.enc(date)}")
    val resp = HttpPageClient.pooled.send(
      HttpRequest.newBuilder(uri).timeout(HttpPageClient.RequestTimeout).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 =>
        val days = mapper.readTree(resp.body()).path("forecast").path("forecastday")
        if (!days.isArray || days.size() == 0)
          throw new IllegalStateException(
            s"no forecastday in 200 response for $name (error-in-200 or out-of-window date)")
        val hours = days.get(0).path("hour")
        if (!hours.isArray)
          throw new IllegalStateException(s"no hourly block in 200 response for $name")
        (0 until hours.size()).map { h =>
          val e = hours.get(h)
          val time = e.path("time").asText("")
          val t = e.path("temp_c")
          // A missing/non-numeric temp_c would asDouble() to 0.0 and
          // silently poison the daily mean; the reference raises
          // KeyError and the city rides the skip path — same here.
          if (time.isEmpty || !t.isNumber || !java.lang.Double.isFinite(t.asDouble()))
            throw new IllegalStateException(
              s"malformed hour entry $h for $name (time='$time', temp_c=$t)")
          HourlyTemp(time, name, t.asDouble())
        }
      case 429 | 500 | 502 | 503 | 504 => throw new TransientCityError(name, attempt)
      case other => throw new IllegalStateException(
        s"HTTP $other fetching weather for $name: ${resp.body().take(200)}")
    }
  }
}
