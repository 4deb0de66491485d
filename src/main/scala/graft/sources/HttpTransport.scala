package graft.sources

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** The LIVE binding of [[CrossrefFetch.Transport]]: a `java.net.http`
  * client that turns (url, params, headers) into a real GET. This is
  * the last piece of the reference's S2 ingest surface
  * (src/barrazueta_pipeline_etl_crossref.py:49 `requests.get(...)`) —
  * everything above the socket (retry ladder, backoff, cursor walk,
  * etiquette headers) lives in [[CrossrefFetch]] and is transport-
  * agnostic; this object is ONLY the wire.
  *
  * Wire contract, mirrored from the reference's `requests` defaults:
  *  - query params are URL-encoded (UTF-8, `+` for space is avoided:
  *    `%20`, since Crossref filter values carry `+` meaningfully in
  *    ORCID ranges) and appended in sorted-key order (deterministic
  *    URLs make request logs and stub assertions stable; servers do
  *    not key on param order),
  *  - redirects are followed (requests' `allow_redirects=True`),
  *  - the response body is decoded as UTF-8 (Crossref serves JSON),
  *  - `Retry-After` is surfaced to the retry loop: numeric seconds
  *    verbatim; an RFC-1123 HTTP-date is converted to a non-negative
  *    delta from now (both forms are legal per RFC 9110 §10.2.3).
  *
  * IO failures (connect refused, timeouts) are NOT retried here — the
  * reference's `get_with_retry` also only retries on HTTP status, and
  * a transport that silently retried would double-count against the
  * policy's `maxTries` budget. They propagate as the exceptions
  * `HttpClient` throws.
  *
  * Zero-egress note: the build container cannot reach the network, so
  * the spec exercises this against an in-process `127.0.0.1` stub
  * server (HttpTransportSpec) — same socket path, no egress.
  */
object HttpTransport {

  /** Shared client: follow redirects, bounded connect wait. */
  lazy val defaultClient: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  private def enc(s: String): String =
    // URLEncoder is form-encoding: space -> '+'. Query strings want
    // percent-encoding, and Crossref filters treat '+' as data.
    URLEncoder.encode(s, StandardCharsets.UTF_8).replace("+", "%20")

  /** Deterministic query string: sorted keys, percent-encoded. */
  def queryString(params: Map[String, String]): String =
    params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }
      .mkString("&")

  /** Parse a Retry-After header value: numeric seconds, or an
    * RFC-1123 date converted to seconds from `now` (floored at 0 — a
    * date in the past means retry immediately, not wait negatively).
    */
  def parseRetryAfter(value: String,
      now: java.time.Instant = java.time.Instant.now()): Option[Double] =
    // clamp the numeric branch like the date branch: a negative value
    // (skewed server) must mean "retry now", not sleep(-1) →
    // IllegalArgumentException; non-finite values (toDoubleOption
    // accepts "Infinity"/"NaN") must not hang the crawl forever
    value.trim.toDoubleOption.filter(_.isFinite)
      .map(d => math.max(0.0, d)).orElse {
      try {
        val at = java.time.ZonedDateTime.parse(value.trim,
          java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
        Some(math.max(0.0,
          Duration.between(now, at.toInstant).toMillis / 1000.0))
      } catch { case _: java.time.format.DateTimeParseException => None }
    }

  /** A [[CrossrefFetch.Transport]] over the given client.
    * `requestTimeout` bounds each request end-to-end (the reference
    * lets `requests` blocking-read forever; a crawl that can hang on
    * one page is worse than one that surfaces the timeout).
    */
  def transport(client: HttpClient = defaultClient,
      requestTimeout: Duration = Duration.ofSeconds(120))
      : CrossrefFetch.Transport =
    (url, params, headers) => {
      val qs = queryString(params)
      val full = if (qs.isEmpty) url
        else url + (if (url.contains("?")) "&" else "?") + qs
      val b = HttpRequest.newBuilder(URI.create(full))
        .timeout(requestTimeout).GET()
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(),
        HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
      val retryAfter = resp.headers().firstValue("Retry-After")
        .map[Option[Double]](v => parseRetryAfter(v))
        .orElse(None)
      CrossrefFetch.Response(resp.statusCode(), resp.body(), retryAfter)
    }
}
