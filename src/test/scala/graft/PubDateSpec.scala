package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.html.PubDate

/** Publication-date precedence chain pinned for the `pub_dates`
  * oracle. */
class PubDateSpec extends AnyFunSuite {

  test("precedence: og beats microdata beats meta_date beats time beats url") {
    val html =
      """<html><head>
        |<meta property="article:published_time" content="2023-07-15T08:30:00Z">
        |<meta itemprop="datePublished" content="2021-02-28">
        |<meta name="date" content="2019/03/09">
        |</head><body><time datetime="2020-02-29">x</time></body></html>"""
        .stripMargin
    assert(PubDate.extract("http://h/blog/2018/11/23/p", html) ==
      ("2023-07-15", "og_article"))
  }

  test("invalid candidate falls through to the next source") {
    val html =
      """<meta property="article:published_time" content="2023-13-05">
        |<meta itemprop="datePublished" content="2021-02-28">""".stripMargin
    assert(PubDate.extract("http://h/p", html) == ("2021-02-28", "microdata"))
  }

  test("first-wins within a source; name matching is case-insensitive") {
    val html =
      """<meta name="DATE" content="2019/03/09">
        |<meta name="date" content="2001-01-01">""".stripMargin
    assert(PubDate.extract("http://h/p", html) == ("2019-03-09", "meta_date"))
  }

  test("leap-year validation: 2020-02-29 valid, 2021-02-29 falls through") {
    assert(PubDate.extract("http://h/p",
      """<time datetime="2020-02-29T12:00:00">x</time>""") ==
      ("2020-02-29", "time_elem"))
    assert(PubDate.extract("http://h/p",
      """<time datetime="2021-02-29">x</time>""") == ("", "none"))
  }

  test("attr-less <time> is skipped, not parsed as text") {
    val html = """<time>2000-01-01</time><time datetime="2015-06-07">x</time>"""
    assert(PubDate.extract("http://h/p", html) == ("2015-06-07", "time_elem"))
  }

  test("url path: full date, month-only default day, year-range gate") {
    assert(PubDate.fromUrl("http://h/blog/2018/11/23/post.html") == "2018-11-23")
    assert(PubDate.fromUrl("http://h/archive/2017/06/") == "2017-06-01")
    assert(PubDate.fromUrl("http://h/x/1985/06/01/") == "",
      "year below 1991 is not a plausible web publication date")
    assert(PubDate.fromUrl("http://h/a/2018/13/2/") == "",
      "month 13 never validates")
    assert(PubDate.fromUrl("http://h/p/123456") == "")
  }

  test("candidate parsing: prefix-only, mixed separators rejected") {
    assert(PubDate.parseCandidate(" 2019-03-09 17:00 ") == "2019-03-09")
    assert(PubDate.parseCandidate("2019/03-09") == "")
    assert(PubDate.parseCandidate("19-03-09") == "")
    assert(PubDate.parseCandidate("") == "")
    assert(PubDate.parseCandidate(null) == "")
  }

  test("typed rows surface") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq(
      (1L, "http://h/2016/05/04/x", "<p>no meta</p>"),
      (2L, "http://h/p", """<meta name="date" content="2014-10-11">"""))
      .toDF("doc_id", "url", "page_html")
    val got = PubDate.pubDateRows(df, "doc_id", "url", "page_html")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "2016-05-04", "url_path"),
      (2L, "2014-10-11", "meta_date")))
  }
}
