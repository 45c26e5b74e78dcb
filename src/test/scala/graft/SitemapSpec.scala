package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.html.Sitemap
import graft.html.Sitemap.Entry

/** Sitemaps.org protocol semantics pinned for the `sitemap_entries`
  * oracle. */
class SitemapSpec extends AnyFunSuite {

  test("urlset: full and partial entries; loc-less entries drop") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>http://a.example/p?x=1&amp;y=2</loc>
        |    <lastmod>2026-01-15</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc> http://a.example/q </loc></url>
        |  <url><lastmod>2026-01-01</lastmod></url>
        |</urlset>""".stripMargin
    assert(Sitemap.parse(xml) == List(
      Entry("url", "http://a.example/p?x=1&y=2", "2026-01-15", "daily", "0.8"),
      Entry("url", "http://a.example/q", "", "", "")))
  }

  test("sitemapindex entries carry kind=sitemap") {
    val xml =
      """<sitemapindex>
        |  <sitemap><loc>http://h.example/s1.xml</loc>
        |    <lastmod>2026-02-01T00:00:00Z</lastmod></sitemap>
        |  <sitemap><loc>http://h.example/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemap.parse(xml) == List(
      Entry("sitemap", "http://h.example/s1.xml", "2026-02-01T00:00:00Z", "", ""),
      Entry("sitemap", "http://h.example/s2.xml", "", "", "")))
  }

  test("case-insensitive elements, unknown children skipped, EOF closes") {
    val xml = "<URLSET><URL><LOC>http://c.example/</LOC>" +
      "<unknown>junk</unknown><PRIORITY>1.0</PRIORITY>"
    assert(Sitemap.parse(xml) ==
      List(Entry("url", "http://c.example/", "", "", "1.0")))
    assert(Sitemap.parse("") == Nil)
    assert(Sitemap.parse("<urlset><url></url></urlset>") == Nil)
  }

  test("a new entry implicitly closes a dangling one") {
    val xml = "<urlset><url><loc>http://d.example/1</loc>" +
      "<url><loc>http://d.example/2</loc></url></urlset>"
    assert(Sitemap.parse(xml).map(_.loc) ==
      List("http://d.example/1", "http://d.example/2"))
  }
}
