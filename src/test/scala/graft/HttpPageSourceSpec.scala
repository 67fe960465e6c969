package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.HttpPageClient
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.concurrent.TrieMap

/** The LIVE transport, end to end over a real socket: an in-process
  * HTTP server speaks the reference API's wire protocol — ROPC token
  * POST (auth.py:61-109), Bearer + subscription-key headers and
  * page/size params (client.py:41-58), positional `fields`+`data`
  * payloads (main.py:59-74) — and `spark.read.format("ercot-pages")
  * .option("endpoint", …)` consumes it through the same DSv2 scan the
  * oracle-checked generator path uses. Faults are injected server-side
  * (429 storms, token revocation → 401), so retry/backoff and the
  * re-mint path are exercised against real HTTP responses, not stubs. */
class HttpPageSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private val Pages = 4
  private val PageSize = 30
  private val Rows = Pages * PageSize
  private val StartDays = java.time.LocalDate.parse("2024-01-01").toEpochDay

  // ---- server state ---------------------------------------------------
  private var server: HttpServer = _
  private var base: String = _
  private val mints = new AtomicInteger(0)
  @volatile private var revoked = Set.empty[String]
  private val pageAttempts = TrieMap.empty[Int, Int] // 1-based page → GETs
  @volatile private var rateLimit429s = 0 // every page 429s its first N GETs
  @volatile private var lastParams = Map.empty[String, String]
  @volatile private var servedRows = 0 // the append-only feed's current size

  private def validToken(t: String): Boolean = {
    val ok = (1 to mints.get()).map(n => s"srv-tok-$n").toSet -- revoked
    ok(t)
  }

  import TestHttp.{respond, queryParams => query}

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/token", (x: HttpExchange) => {
      val q = Option(x.getRequestURI.getRawQuery).getOrElse("")
      if (x.getRequestMethod != "POST" || !q.contains("grant_type=password") ||
        !q.contains("username=ops%40example.com") || !q.contains("client_id=client-1"))
        respond(x, 400, """{"error":"invalid_request"}""")
      else {
        val n = mints.incrementAndGet()
        // expires_in as a STRING — the reference coerces it (auth.py:96)
        respond(x, 200, s"""{"access_token":"srv-tok-$n","expires_in":"3600"}""")
      }
    })
    server.createContext("/reports/sced", (x: HttpExchange) => {
      val params = query(x)
      lastParams = params
      val tok = Option(x.getRequestHeaders.getFirst("Authorization"))
        .getOrElse("").stripPrefix("Bearer ")
      if (Option(x.getRequestHeaders.getFirst("Ocp-Apim-Subscription-Key"))
        .getOrElse("") != "sub-key-1") respond(x, 403, """{"error":"bad key"}""")
      else if (!validToken(tok)) respond(x, 401, """{"error":"expired"}""")
      else {
        val page = params("page").toInt
        val n = pageAttempts.updateWith(page)(c => Some(c.getOrElse(0) + 1)).get
        if (n <= rateLimit429s) respond(x, 429, """{"message":"rate limited"}""")
        else respond(x, 200, TestHttp.ercotPageJson(page, params("size").toInt,
          servedRows, StartDays, params.get("settlementPoint")))
      }
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def resetFaults(): Unit = {
    pageAttempts.clear(); rateLimit429s = 0; revoked = Set.empty
    servedRows = Rows
  }

  private def live(extra: (String, String)*) = {
    var r = spark.read.format("ercot-pages")
      .option("endpoint", s"$base/reports/sced")
      .option("tokenUrl", s"$base/token")
      .option("username", "ops@example.com").option("password", "hunter2!")
      .option("clientId", "client-1").option("subscriptionKey", "sub-key-1")
      .option("pageSize", PageSize).option("retryDelayMs", 0)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  private def generated =
    spark.read.format("ercot-pages")
      .option("pages", Pages).option("pageSize", PageSize)
      .option("startDate", "2024-01-01").load()

  test("live HTTP read is row-identical to the oracle-checked generator") {
    resetFaults(); HttpPageClient.clearTokenCache()
    val viaHttp = live("pages" -> Pages.toString).collect().map(_.toString).sorted
    val viaGen = generated.collect().map(_.toString).sorted
    assert(viaHttp.length == Rows)
    assert(viaHttp.sameElements(viaGen))
    assert(mints.get() >= 1, "the read must have authenticated")
  }

  test("unknown page count: a 1-record probe reads _meta.totalRecords and sizes the scan") {
    resetFaults()
    val df = live() // no `pages` option
    assert(df.rdd.getNumPartitions == Pages)
    assert(df.count() == Rows)
  }

  test("429 storm rides the bounded retry; an exhausted budget fails the read") {
    resetFaults()
    rateLimit429s = 2 // every page: two 429s, then success
    assert(live("pages" -> Pages.toString, "maxRetries" -> "3").count() == Rows)
    assert(pageAttempts.values.forall(_ >= 3), s"attempts: $pageAttempts")

    resetFaults()
    rateLimit429s = 2
    val e = intercept[org.apache.spark.SparkException] {
      live("pages" -> Pages.toString, "maxRetries" -> "2").count()
    }
    def transient(t: Throwable): Boolean =
      t != null && (t.getMessage.contains("transient fault") || transient(t.getCause))
    assert(transient(e))
  }

  test("server-side 401 invalidates the cached token and re-mints exactly once") {
    resetFaults(); HttpPageClient.clearTokenCache()
    assert(live("pages" -> Pages.toString).count() == Rows)
    val before = mints.get()
    revoked = (1 to before).map(n => s"srv-tok-$n").toSet // kill every live token
    assert(live("pages" -> Pages.toString).count() == Rows)
    // All 4 concurrent page readers hit 401, but exact-match invalidation
    // + minting under the provider lock mean ONE fresh mint serves all.
    assert(mints.get() == before + 1,
      s"expected one re-mint, got ${mints.get() - before}")
  }

  test("pushed settlement_point equality travels as the server-side request param") {
    resetFaults()
    val df = live("pages" -> Pages.toString)
      .filter(col("settlement_point") === "HB_SOUTH")
    val rows = df.collect()
    assert(lastParams.get("settlementPoint").contains("HB_SOUTH"),
      s"server saw params: $lastParams")
    assert(rows.nonEmpty && rows.forall(_.getAs[String]("settlement_point") == "HB_SOUTH"))
    // and the filtered read matches the generator-path equivalent
    assert(rows.length ==
      generated.filter(col("settlement_point") === "HB_SOUTH").count())
  }

  test("a filtered scan probes _meta WITH the pushed param and plans the filtered page count") {
    resetFaults()
    // HB_SOUTH matches 1-in-5 rows: 24 of 120. The server filters before
    // paginating, so the filtered feed is ONE page, not four — a probe
    // without the param would over-plan 4 partitions and burn three
    // authenticated round trips on pages the server returns empty.
    val df = live() // no `pages` option: the probe sizes the scan
      .filter(col("settlement_point") === "HB_SOUTH")
    assert(df.rdd.getNumPartitions == 1,
      s"planned ${df.rdd.getNumPartitions} partitions for a 1-page filtered feed")
    assert(df.count() == Rows / 5)
    assert(lastParams.get("settlementPoint").contains("HB_SOUTH"),
      s"the probe/readers must carry the param; server saw: $lastParams")
  }

  test("the live endpoint streams: each poll probes _meta and delivers only new complete pages") {
    resetFaults()
    val q = spark.readStream.format("ercot-pages")
      .option("endpoint", s"$base/reports/sced")
      .option("tokenUrl", s"$base/token")
      .option("username", "ops@example.com").option("password", "hunter2!")
      .option("clientId", "client-1").option("subscriptionKey", "sub-key-1")
      .option("pageSize", PageSize).option("retryDelayMs", 0)
      .load()
      .writeStream.format("memory").queryName("live_pages")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("live_pages_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("live_pages").count() == Rows)
      // the feed appends 2 pages plus a PARTIAL page; only complete
      // pages may ship (a partial page could still grow — re-reading
      // it later would double-deliver its rows)
      servedRows = Rows + 2 * PageSize + PageSize / 2
      q.processAllAvailable()
      val n = spark.table("live_pages").count()
      assert(n == Rows + 2 * PageSize, s"saw $n rows")
      assert(spark.table("live_pages").distinct().count() == Rows + 2 * PageSize)
    } finally q.stop()
  }

  test("bad subscription key fails fast (no retry budget burned)") {
    resetFaults()
    val df = spark.read.format("ercot-pages")
      .option("endpoint", s"$base/reports/sced")
      .option("tokenUrl", s"$base/token")
      .option("username", "ops@example.com").option("password", "hunter2!")
      .option("clientId", "client-1").option("subscriptionKey", "WRONG")
      .option("pages", 1).option("pageSize", 5).option("retryDelayMs", 0)
      .load()
    val e = intercept[org.apache.spark.SparkException](df.count())
    def httpErr(t: Throwable): Boolean =
      t != null && (t.getMessage.contains("HTTP 403") || httpErr(t.getCause))
    assert(httpErr(e))
    assert(pageAttempts.getOrElse(1, 0) <= 1, "4xx must not be retried")
  }
}
