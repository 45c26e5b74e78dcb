package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Robots

/** Sitemap-line extraction semantics pinned for the `robots_sitemaps`
  * oracle. */
class RobotsSitemapSpec extends AnyFunSuite {

  test("sitemap lines are global: collected inside and outside groups") {
    val txt = "Sitemap: http://h/a.xml\nUser-agent: g\nDisallow: /\n" +
      "Sitemap: http://h/b.xml\n"
    assert(Robots.sitemapUrls(txt) ==
      Vector("http://h/a.xml", "http://h/b.xml"))
  }

  test("field case-insensitive, value case kept, comments stripped") {
    val txt = "SITEMAP: http://h/A.xml # note\nsitemap:http://h/b.xml\n"
    assert(Robots.sitemapUrls(txt) ==
      Vector("http://h/A.xml", "http://h/b.xml"))
  }

  test("empty values and comment-only/absent lines drop; null safe") {
    assert(Robots.sitemapUrls("Sitemap:   \n# c\nUser-agent: *\n")
      .isEmpty)
    assert(Robots.sitemapUrls(null).isEmpty)
  }

  test("duplicates keep file order") {
    val txt = "Sitemap: http://h/x.xml\nSitemap: http://h/x.xml\n"
    assert(Robots.sitemapUrls(txt) ==
      Vector("http://h/x.xml", "http://h/x.xml"))
  }
}
