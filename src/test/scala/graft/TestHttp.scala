package graft

import com.sun.net.httpserver.HttpExchange
import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8

/** Shared plumbing for the in-process wire-protocol servers the live
  * transport specs run against (paginated report, weather, key-value
  * store) — one copy of the respond/param-decode helpers so the specs
  * can't drift apart. */
object TestHttp {
  def respond(x: HttpExchange, code: Int, body: String,
      contentType: String = "application/json"): Unit = {
    val b = body.getBytes(UTF_8)
    x.getResponseHeaders.set("Content-Type", contentType)
    x.sendResponseHeaders(code, b.length)
    x.getResponseBody.write(b)
    x.close()
  }

  /** Decode the request's query string into a param map. */
  def queryParams(x: HttpExchange): Map[String, String] =
    Option(x.getRequestURI.getRawQuery).getOrElse("").split("&").toIndexedSeq
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        URLDecoder.decode(k, UTF_8) -> URLDecoder.decode(v, UTF_8)
      }.toMap

  /** One report page of the deterministic feed in the reference API's
    * positional wire shape — ISO timestamps, fields deliberately
    * ordered DIFFERENTLY from the Spark schema so name→ordinal decode
    * stays honest. Shared by every spec that stands up the report
    * server.
    *
    * A `settlementPoint` param models REAL server-side filtering:
    * the feed is filtered FIRST, then paginated over the matching
    * rows, and `_meta.totalRecords` reports the FILTERED count — so a
    * filtered scan that probes `_meta` plans the smaller page count
    * (and a planner that probed without the filter would over-plan). */
  def ercotPageJson(page: Int, size: Int, servedRows: Long, startDays: Long,
      spFilter: Option[String]): String = {
    import graft.sources.ErcotPagesSource
    val matching = (0L until servedRows)
      .filter(i => spFilter.forall(_ == ErcotPagesSource.hub(i)))
    val lo = (page - 1).toLong * size
    val data = matching.slice(lo.toInt, math.min(lo + size, matching.size).toInt)
      .map { i =>
        val iso = java.time.LocalDateTime.ofEpochSecond(
          ErcotPagesSource.tsMicros(startDays, i) / 1000000L, 0,
          java.time.ZoneOffset.UTC).toString
        s"""["${ErcotPagesSource.hub(i)}",${ErcotPagesSource.price(i)},"$iso",${ErcotPagesSource.mw(i)}]"""
      }.mkString(",")
    s"""{"_meta":{"totalRecords":${matching.size}},
       |"fields":[{"name":"settlementPoint"},{"name":"price"},
       |          {"name":"SCEDTimestamp"},{"name":"mw"}],
       |"data":[$data]}""".stripMargin
  }
}
