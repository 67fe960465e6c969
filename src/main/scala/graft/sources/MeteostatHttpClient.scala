package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.URI
import java.net.http.{HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.util.control.NonFatal

/** Connection settings for the live daily-climate scan. The reference
  * reaches Meteostat through its Python library
  * (meteostat_weather.py:1,43-44); on the wire that library reads the
  * public BULK endpoints — one gzipped daily CSV per weather station —
  * which is what this client speaks directly. Station ids stand in for
  * the library's internal Point→station resolution: callers supply
  * `(city, stationId)` pairs. */
final case class MeteostatConf(baseUrl: String)

/** One station's reading for the target date (S4's long shape). */
final case class StationTavg(city: String, tavg: Double)

/** Result of a daily fetch: per-city first-non-NaN `tavg` rows plus
  * the two loss counters the reference buries in prints — cities whose
  * fetch FAILED after retries (meteostat_weather.py:51-53) and cities
  * that responded but had no valid reading for the date (the silent
  * `break`-never-hit path, :45-50). Surfaced as metrics: at fleet
  * scale a silently shrinking mean is a data-quality incident. Both
  * counts are aggregated from the checkpointed status rows (see
  * [[FanOut]]) — exact under task retries, unlike a transformation-
  * side accumulator. */
final case class MeteostatFetch(frame: Dataset[StationTavg],
    skippedCities: Long, noDataCities: Long)

/** Live Meteostat daily scan (SURVEY §2.1 S4; reference
  * meteostat_weather.py:6-58): per-station gzipped CSV GET, filter to
  * the target date, FIRST non-NaN `tavg` per city, then the caller
  * means across cities (A7 first-per-group + mean — exactly q20's
  * oracle-checked shape, here over the live wire).
  *
  * Same fan-out design as the sibling scans: station-per-task, shared
  * bounded-backoff retry for transient faults, skip-and-count for
  * cities that never recover. The bulk CSV's daily schema is
  * date,tavg,tmin,tmax,… — column 1 is the only one this scan needs,
  * and an empty field is the NaN the reference guards against. */
object MeteostatHttpClient {

  def fetchDailyTavg(spark: SparkSession, conf: MeteostatConf, date: String,
      stations: Seq[(String, String)], retry: RetryConf): MeteostatFetch = {
    import spark.implicits._
    val fetch = FanOut.fetch(spark, stations, retry) {
      (city, stationId, attempt) =>
        fetchStation(conf, date, city, stationId, attempt)
          .map(t => StationTavg(city, t)).iterator // None = responded, no valid reading
    }
    MeteostatFetch(fetch.frame, fetch.skipped, fetch.emptyOk)
  }

  /** The reference's headline scalar: mean of the per-city readings,
    * rounded to 2, None when every city came up empty
    * (meteostat_weather.py:55-58). */
  def avgTemperature(spark: SparkSession, conf: MeteostatConf, date: String,
      stations: Seq[(String, String)], retry: RetryConf): Option[Double] = {
    val rows = fetchDailyTavg(spark, conf, date, stations, retry).frame.collect()
    if (rows.isEmpty) None
    else Some(BigDecimal(rows.map(_.tavg).sum / rows.length)
      .setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
  }

  /** One bulk-CSV GET; 429/5xx transient, other non-200 hard (a 404
    * station id never resolves by retrying). Returns the FIRST row of
    * the target date with a parseable tavg. */
  private def fetchStation(conf: MeteostatConf, date: String, city: String,
      stationId: String, attempt: Int): Option[Double] = {
    val uri = URI.create(s"${conf.baseUrl}/$stationId.csv.gz")
    val resp = HttpPageClient.pooled.send(
      HttpRequest.newBuilder(uri).timeout(HttpPageClient.RequestTimeout).GET().build(),
      HttpResponse.BodyHandlers.ofInputStream())
    resp.statusCode() match {
      case 200 =>
        val raw = resp.body()
        // gunzip setup can itself throw (non-gzip body from a broken
        // proxy) — the raw stream must close either way or the pooled
        // connection leaks
        val reader = try new BufferedReader(new InputStreamReader(
          new GZIPInputStream(raw), UTF_8))
        catch { case NonFatal(e) => raw.close(); throw e }
        try {
          Iterator.continually(reader.readLine()).takeWhile(_ != null)
            .map(_.split(",", -1))
            .collectFirst { case cols
              // literal NaN/Infinity cells parse as doubles but poison
              // the mean — they are "no valid reading", like a blank
              if cols.length > 1 && cols(0) == date &&
                cols(1).toDoubleOption.exists(d => !d.isNaN && !d.isInfinite) =>
                cols(1).toDouble }
        } finally reader.close()
      case 429 | 500 | 502 | 503 | 504 =>
        resp.body().close()
        throw new TransientCityError(city, attempt)
      case other =>
        resp.body().close()
        throw new IllegalStateException(
          s"HTTP $other fetching station $stationId ($city)")
    }
  }
}
