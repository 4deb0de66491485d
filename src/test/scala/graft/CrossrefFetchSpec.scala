package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CrossrefFetch
import graft.sources.CrossrefFetch.{Fetched, Response, RetryPolicy}

/** S2 policy tests with scripted transports (zero-egress container — the
  * transport is the injected seam). Asserts the reference's exact
  * degradation ladder, backoff schedule, Retry-After precedence, and the
  * cursor-pagination stop conditions.
  */
class CrossrefFetchSpec extends AnyFunSuite {

  private val datesOnly = "from-pub-date:2022-01-01,until-pub-date:2025-11-30"
  private val fullParams = Map(
    "select" -> "DOI,title,author",
    "sort" -> "indexed", "order" -> "asc",
    "filter" -> s"has-affiliation:true,$datesOnly",
    "rows" -> "500")

  private def noSleep: Double => Unit = _ => ()

  test("400 ladder degrades select -> sort/order -> dates-only filter") {
    val seen = mutable.Buffer.empty[Map[String, String]]
    val transport: CrossrefFetch.Transport = (_, p, _) => {
      seen += p
      if (p.contains("select") || p.contains("sort") || p.contains("order")
        || p("filter").contains("has-affiliation:true"))
        Response(400, """{"status":"failed"}""")
      else Response(200, """{"message":{"items":[{}]}}""")
    }
    val Fetched(resp, params) = CrossrefFetch.getWithRetry(
      transport, "u", fullParams, datesOnly, sleep = noSleep)
    assert(resp.status == 200)
    // final params: no select/sort/order, filter reduced to dates-only
    assert(!params.contains("select") && !params.contains("sort") &&
      !params.contains("order"))
    assert(params("filter") == datesOnly)
    assert(params("rows") == "500") // untouched params survive
    // ladder order: full -> -select -> -sort/order -> dates-only
    assert(seen.map(_.contains("select")).toSeq ==
      Seq(true, false, false, false))
    assert(seen.map(_.contains("sort")).toSeq ==
      Seq(true, true, false, false))
    assert(seen.map(_("filter").contains("has-affiliation")).toSeq ==
      Seq(true, true, true, false))
  }

  test("retryable statuses back off 1,2,4... capped, Retry-After wins") {
    val sleeps = mutable.Buffer.empty[Double]
    var calls = 0
    val transport: CrossrefFetch.Transport = (_, _, _) => {
      calls += 1
      calls match {
        case 1 => Response(503, "")
        case 2 => Response(429, "", retryAfter = Some(7.5))
        case 3 => Response(502, "")
        case _ => Response(200, "ok")
      }
    }
    val got = CrossrefFetch.getWithRetry(transport, "u", Map(), datesOnly,
      sleep = sleeps += _)
    assert(got.response.status == 200)
    // backoff doubles only as scheduled waits are consumed; Retry-After
    // overrides the wait but not the progression
    assert(sleeps.toSeq == Seq(1.0, 7.5, 4.0))
  }

  test("gives up after maxTries retryable responses") {
    var calls = 0
    val transport: CrossrefFetch.Transport = (_, _, _) => {
      calls += 1; Response(503, "overloaded")
    }
    val e = intercept[CrossrefFetch.FetchFailedException] {
      CrossrefFetch.getWithRetry(transport, "u", Map(), datesOnly,
        policy = RetryPolicy(maxTries = 3), sleep = noSleep)
    }
    assert(calls == 3)
    assert(e.getMessage.contains("giving up"))
  }

  test("non-retryable status fails immediately") {
    intercept[CrossrefFetch.FetchFailedException] {
      CrossrefFetch.getWithRetry((_, _, _) => Response(404, "nope"), "u",
        Map(), datesOnly, sleep = noSleep)
    }
  }

  test("cursor pagination follows next-cursor and stops on empty page") {
    def page(items: Int, next: String) =
      s"""{"message":{"items":[${Seq.fill(items)("{}").mkString(",")}],
         |"next-cursor":"$next"}}""".stripMargin
    val transport: CrossrefFetch.Transport = (_, p, _) =>
      p("cursor") match {
        case "*"  => Response(200, page(2, "c1"))
        case "c1" => Response(200, page(1, "c2"))
        case "c2" => Response(200, """{"message":{"items":[]}}""")
        case c    => fail(s"unexpected cursor $c")
      }
    val pages = CrossrefFetch.fetchPages(transport, "u", Map(), datesOnly,
      sleep = noSleep)
    assert(pages.size == 2)
  }

  test("cursor pagination stops on a repeated cursor (no infinite loop)") {
    val transport: CrossrefFetch.Transport = (_, _, _) =>
      Response(200,
        """{"message":{"items":[{}],"next-cursor":"same"}}""")
    val pages = CrossrefFetch.fetchPages(transport, "u", Map(), datesOnly,
      sleep = noSleep)
    assert(pages.size == 2) // "*" page + one "same" page, then stop
  }

  test("2xx body without message.items fails loudly, not as end-of-data") {
    val transport: CrossrefFetch.Transport = (_, _, _) =>
      Response(200, """{"status":"error","detail":"proxy hiccup"}""")
    val e = intercept[CrossrefFetch.FetchFailedException] {
      CrossrefFetch.fetchPages(transport, "u", Map(), datesOnly,
        sleep = noSleep)
    }
    assert(e.getMessage.contains("without message.items"))
  }

  test("etiquette: the User-Agent/mailto header map rides EVERY " +
      "scripted request — retries and degraded rungs included") {
    val headersSeen = mutable.Buffer.empty[Map[String, String]]
    val et = CrossrefFetch.Etiquette(
      product = "graft-etl/1.0", mailto = Some("ops@example.org"))
    var calls = 0
    val transport: CrossrefFetch.Transport = (_, _, h) => {
      headersSeen += h
      calls += 1
      calls match {
        case 1 => Response(400, "bad select") // degradation rung
        case 2 => Response(503, "")           // retry rung
        case _ => Response(200, "ok")
      }
    }
    val got = CrossrefFetch.getWithRetry(transport, "u",
      Map("select" -> "DOI"), datesOnly, sleep = noSleep, etiquette = et)
    assert(got.response.status == 200)
    assert(headersSeen.size == 3)
    assert(headersSeen.forall(_ == Map(
      "User-Agent" -> "graft-etl/1.0 (mailto:ops@example.org)")))
    // no mailto: the product alone, no dangling parenthetical
    assert(CrossrefFetch.Etiquette(product = "x/2.0").headers ==
      Map("User-Agent" -> "x/2.0"))
  }

  test("etiquette: inter-page pacing sleeps pageDelay between pages, " +
      "never after the last page, and 0 disables it") {
    def page(next: String) =
      s"""{"message":{"items":[{}],"next-cursor":"$next"}}"""
    val transport: CrossrefFetch.Transport = (_, p, _) =>
      p("cursor") match {
        case "*"  => Response(200, page("c1"))
        case "c1" => Response(200, page("c2"))
        case "c2" => Response(200, """{"message":{"items":[]}}""")
        case c    => fail(s"unexpected cursor $c")
      }
    val sleeps = mutable.Buffer.empty[Double]
    val pages = CrossrefFetch.fetchPages(transport, "u", Map(), datesOnly,
      sleep = sleeps += _,
      etiquette = CrossrefFetch.Etiquette(pageDelay = 0.3))
    assert(pages.size == 2)
    // 3 requests -> paced after pages 1 and 2 (each followed by another
    // request), not after the empty terminal page
    assert(sleeps.toSeq == Seq(0.3, 0.3))
    sleeps.clear()
    CrossrefFetch.fetchPages(transport, "u", Map(), datesOnly,
      sleep = sleeps += _,
      etiquette = CrossrefFetch.Etiquette(pageDelay = 0.0))
    assert(sleeps.isEmpty)
    // maxPages cap: a capped crawl must not sleep after its LAST page
    // either (the cap, not end-of-data, ends it)
    sleeps.clear()
    val capped = CrossrefFetch.fetchPages(transport, "u", Map(),
      datesOnly, maxPages = 2, sleep = sleeps += _,
      etiquette = CrossrefFetch.Etiquette(pageDelay = 0.3))
    assert(capped.size == 2)
    assert(sleeps.toSeq == Seq(0.3))
  }

  test("degraded params persist across subsequent pages") {
    val cursorsWithSelect = mutable.Buffer.empty[(String, Boolean)]
    val transport: CrossrefFetch.Transport = (_, p, _) => {
      cursorsWithSelect += ((p("cursor"), p.contains("select")))
      if (p.contains("select")) Response(400, "bad select")
      else p("cursor") match {
        case "*"  => Response(200,
          """{"message":{"items":[{}],"next-cursor":"c1"}}""")
        case _    => Response(200, """{"message":{"items":[]}}""")
      }
    }
    val pages = CrossrefFetch.fetchPages(transport, "u",
      Map("select" -> "DOI"), datesOnly, sleep = noSleep)
    assert(pages.size == 1)
    // select was dropped on page 1 and never re-sent on page 2
    assert(cursorsWithSelect.toSeq ==
      Seq(("*", true), ("*", false), ("c1", false)))
  }
}
