package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Robots
import graft.ops.Robots.Rule

/** RFC 9309 robots semantics: pinned parsing, matching, and
  * precedence for the `robots_allowed` oracle. */
class RobotsSpec extends AnyFunSuite {

  private val txt =
    """# sample
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private/
      |Allow: /private/pub*
      |Crawl-delay: 7
      |
      |User-agent: *
      |Disallow: /*.pdf$
      |Disallow:
      |Allow: relative-ignored
      |""".stripMargin

  test("group selection: specific UA beats *; UA runs share a group") {
    val (rules, delay) = Robots.rulesFor(txt, "GraftBot")
    assert(rules == List(Rule(false, "/private/"),
      Rule(true, "/private/pub*")))
    assert(delay == Some(7L))
    val (star, d2) = Robots.rulesFor(txt, "unknownbot")
    assert(star == List(Rule(false, "/*.pdf$")),
      "empty Disallow and non-/ paths must parse to no rule")
    assert(d2 == None)
  }

  test("wildcard and anchor matching") {
    assert(Robots.matches("/*.pdf$", "/docs/file.pdf"))
    assert(!Robots.matches("/*.pdf$", "/docs/file.pdfx"))
    assert(Robots.matches("/a*b*c", "/aXbYcZ"))
    assert(!Robots.matches("/a*b*c", "/aXcYb"))
    assert(Robots.matches("/p$", "/p"))
    assert(!Robots.matches("/p$", "/pq"))
  }

  test("longest match wins; allow wins ties; no match allows") {
    val rules = List(Rule(false, "/private/"), Rule(true, "/private/pub*"))
    assert(!Robots.isAllowed(rules, "/private/data"))
    assert(Robots.isAllowed(rules, "/private/pubfile"))
    assert(Robots.isAllowed(rules, "/open"))
    assert(Robots.isAllowed(
      List(Rule(false, "/x/"), Rule(true, "/x/$")), "/x/"),
      "allow must win an exact-length tie")
  }

  test("disallow-all for a specific bot leaves * crawlers free") {
    val t = "User-agent: graftbot\nDisallow: /\n\nUser-agent: *\nAllow: /"
    assert(!Robots.isAllowed(Robots.rulesFor(t, "graftbot")._1, "/any"))
    assert(Robots.isAllowed(Robots.rulesFor(t, "other")._1, "/any"))
  }

  test("crawlDelays: group-selected delay, default when absent") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val robots = Seq(
      ("a.com", "User-agent: graftbot\nCrawl-delay: 5\n\n" +
        "User-agent: *\nCrawl-delay: 9"),
      ("b.com", "User-agent: *\nCrawl-delay: 2"),
      ("c.com", "User-agent: *\nDisallow: /x/")
    ).toDF("host", "robots_txt")
    val got = Robots.crawlDelays(robots, "host", "robots_txt",
        "graftbot", defaultDelay = 1L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a.com" -> 5L, "b.com" -> 2L, "c.com" -> 1L),
      "specific group's delay beats *; groups without one default")
  }

  test("allowedFlags: per-host evaluation, missing robots allows") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val frontier = Seq(
      ("a.com", "/private/data"), ("a.com", "/private/pubx"),
      ("b.com", "/anything")
    ).toDF("host", "path")
    val robots = Seq(("a.com", txt)).toDF("host", "robots_txt")
    val r = Robots.allowedFlags(frontier, robots, "host", "path",
        "robots_txt", "graftbot")
      .as[(String, String, Boolean)].collect().toSet
    assert(r == Set(
      ("a.com", "/private/data", false),
      ("a.com", "/private/pubx", true),
      ("b.com", "/anything", true)))
  }
}
