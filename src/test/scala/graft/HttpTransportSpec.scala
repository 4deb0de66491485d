package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CrossrefFetch, HttpTransport}
import graft.sources.CrossrefFetch.{Etiquette, RetryPolicy}

/** The LIVE transport exercised over real sockets against an in-process
  * 127.0.0.1 stub server (zero egress — the same `java.net.http` path a
  * deployment uses, pointed at localhost). CrossrefFetchSpec proves the
  * POLICY with scripted transports; this spec proves the WIRE: etiquette
  * headers actually on the request, query params actually encoded,
  * Retry-After actually parsed off a real response, and the full
  * degradation ladder / backoff / cursor walk driven end-to-end through
  * HTTP. Reference anchor: src/barrazueta_pipeline_etl_crossref.py:49
  * (`requests.get`), :16-17 (session User-Agent).
  */
class HttpTransportSpec extends AnyFunSuite {

  private val datesOnly = "from-pub-date:2022-01-01,until-pub-date:2025-11-30"

  /** One request as the server saw it. */
  private case class Seen(path: String, query: String,
      userAgent: Option[String])

  /** Start a stub server whose behavior per request is `script(i)` for
    * the i-th request (0-based): (status, body, extraHeaders). Returns
    * (baseUrl, seenBuffer, stop).
    */
  private def stub(script: Int => (Int, String, Map[String, String]))
      : (String, mutable.Buffer[Seen], () => Unit) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = mutable.Buffer.empty[Seen]
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/works", (ex: HttpExchange) => {
      val i = n.getAndIncrement()
      seen.synchronized {
        seen += Seen(ex.getRequestURI.getPath,
          Option(ex.getRequestURI.getRawQuery).getOrElse(""),
          Option(ex.getRequestHeaders.getFirst("User-Agent")))
      }
      val (status, body, headers) = script(i)
      headers.foreach { case (k, v) =>
        ex.getResponseHeaders.add(k, v)
      }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    (s"http://127.0.0.1:${server.getAddress.getPort}/works", seen,
      () => server.stop(0))
  }

  private def page(items: Int, next: Option[String]): String = {
    val arr = (0 until items).map(i => s"""{"DOI":"10.1/$i"}""")
      .mkString("[", ",", "]")
    val cur = next.fold("")(c => s""","next-cursor":"$c"""")
    s"""{"message":{"items":$arr$cur}}"""
  }

  test("etiquette headers and encoded params arrive on the wire") {
    val (url, seen, stop) = stub(_ => (200, page(1, None), Map.empty))
    try {
      val got = CrossrefFetch.getWithRetry(HttpTransport.transport(),
        url, Map("filter" -> s"has-affiliation:true,$datesOnly",
          "rows" -> "500"),
        datesOnly, sleep = _ => (),
        etiquette = Etiquette("graft-etl/1.0",
          Some("data@example.org")))
      assert(got.response.status == 200)
      assert(seen.size == 1)
      assert(seen.head.userAgent
        .contains("graft-etl/1.0 (mailto:data@example.org)"))
      // sorted keys, percent-encoded (':' and ',' are safe to encode;
      // the server decodes either way — assert on the RAW query)
      assert(seen.head.query ==
        "filter=has-affiliation%3Atrue%2C" +
          "from-pub-date%3A2022-01-01%2Cuntil-pub-date%3A2025-11-30" +
          "&rows=500")
    } finally stop()
  }

  test("queryString: empty params yield an empty string; keys sort; " +
      "spaces percent-encode (never '+')") {
    assert(HttpTransport.queryString(Map.empty) == "")
    assert(HttpTransport.queryString(Map("b" -> "2", "a" -> "1 x")) ==
      "a=1%20x&b=2")
  }

  test("429 with numeric Retry-After: the wait honors the header, " +
      "then the retry succeeds") {
    val (url, seen, stop) = stub {
      case 0 => (429, """{"err":"slow down"}""",
        Map("Retry-After" -> "7"))
      case _ => (200, page(1, None), Map.empty)
    }
    val waits = mutable.Buffer.empty[Double]
    try {
      val got = CrossrefFetch.getWithRetry(HttpTransport.transport(),
        url, Map("rows" -> "5"), datesOnly,
        sleep = waits += _)
      assert(got.response.status == 200)
      assert(waits.toSeq == Seq(7.0))
      assert(seen.size == 2)
    } finally stop()
  }

  test("Retry-After as an RFC-1123 date parses to a bounded delta; " +
      "a past date means zero wait") {
    val in90s = java.time.ZonedDateTime
      .now(java.time.ZoneOffset.UTC).plusSeconds(90)
      .format(java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
    val parsed = HttpTransport.parseRetryAfter(in90s).get
    assert(parsed > 80.0 && parsed <= 91.0)
    assert(HttpTransport.parseRetryAfter(
      "Wed, 21 Oct 2015 07:28:00 GMT").contains(0.0))
    assert(HttpTransport.parseRetryAfter("not-a-date").isEmpty)
    // numeric branch clamps like the date branch: negative -> retry
    // now (sleep(-1) would throw); non-finite -> unusable, ignored
    assert(HttpTransport.parseRetryAfter("-1").contains(0.0))
    assert(HttpTransport.parseRetryAfter("Infinity").isEmpty)
    assert(HttpTransport.parseRetryAfter("NaN").isEmpty)
    assert(HttpTransport.parseRetryAfter("2.5").contains(2.5))
  }

  test("5xx backoff doubles from 1s and gives up after maxTries " +
      "over the real socket") {
    val (url, seen, stop) = stub(_ => (503, "down", Map.empty))
    val waits = mutable.Buffer.empty[Double]
    try {
      val ex = intercept[CrossrefFetch.FetchFailedException] {
        CrossrefFetch.getWithRetry(HttpTransport.transport(),
          url, Map("rows" -> "5"), datesOnly,
          policy = RetryPolicy(maxTries = 4), sleep = waits += _)
      }
      assert(ex.getMessage.contains("giving up after 4 tries"))
      assert(waits.toSeq == Seq(1.0, 2.0, 4.0))
      assert(seen.size == 4)
    } finally stop()
  }

  test("400 degradation ladder walks the wire: select dropped, then " +
      "sort/order, then dates-only filter wins") {
    // query-sensitive stub (the per-request-index `stub` can't express
    // it): 400 while select/sort/order present or the filter still
    // carries has-affiliation
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val queries = mutable.Buffer.empty[String]
    server.createContext("/works", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      queries.synchronized { queries += q }
      val bad = q.contains("select=") || q.contains("sort=") ||
        q.contains("order=") || q.contains("has-affiliation")
      val (status, body) =
        if (bad) (400, """{"err":"bad params"}""")
        else (200, page(2, None))
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}/works"
    try {
      val got = CrossrefFetch.getWithRetry(HttpTransport.transport(),
        base, Map(
          "select" -> "DOI,title", "sort" -> "indexed",
          "order" -> "asc",
          "filter" -> s"has-affiliation:true,$datesOnly",
          "rows" -> "500"),
        datesOnly, sleep = _ => ())
      assert(got.response.status == 200)
      // final params: the dates-only filter, no select/sort/order
      assert(got.params ==
        Map("filter" -> datesOnly, "rows" -> "500"))
      assert(queries.size == 4) // full -> -select -> -sort/order -> ok
      assert(!queries.last.contains("select="))
      assert(!queries.last.contains("has-affiliation"))
    } finally server.stop(0)
  }

  test("cursor pagination walks pages over HTTP and paces between " +
      "them; stops on empty items") {
    val (url, seen, stop) = stub {
      case 0 => (200, page(2, Some("c1")), Map.empty)
      case 1 => (200, page(2, Some("c2")), Map.empty)
      case _ => (200, page(0, None), Map.empty)
    }
    val waits = mutable.Buffer.empty[Double]
    try {
      val pages = CrossrefFetch.fetchPages(HttpTransport.transport(),
        url, Map("rows" -> "2"), datesOnly,
        sleep = waits += _,
        etiquette = Etiquette(pageDelay = 0.3))
      assert(pages.size == 2)
      assert(seen.size == 3)
      // cursor param advanced on the wire: page 2 carries c1, page 3 c2
      assert(seen(1).query.contains("cursor=c1"))
      assert(seen(2).query.contains("cursor=c2"))
      // 0.3 s pacing after each followed page (never after the last)
      assert(waits.toSeq == Seq(0.3, 0.3))
    } finally stop()
  }
}
