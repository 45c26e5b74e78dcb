package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.html.Meta

/** Head-metadata semantics pinned for the `page_meta` oracle. */
class MetaSpec extends AnyFunSuite {

  test("title: RCDATA content, whitespace-collapsed, entity-decoded") {
    val m = Meta.extract(
      "<html><head><TITLE>  A &amp; B\n <b>not-a-tag</b> </title></head>")
    assert(m.title == "A & B <b>not-a-tag</b>",
      "title is RCDATA: markup inside stays text")
  }

  test("first-wins: duplicate title/canonical/description ignored") {
    val m = Meta.extract(
      """<title>First</title><title>Second</title>
        |<link rel=canonical href="http://a/1">
        |<link rel="CANONICAL" href="http://a/2">
        |<meta name=description content="d1">
        |<meta name="Description" content="d2">""".stripMargin)
    assert(m.title == "First")
    assert(m.canonical == "http://a/1")
    assert(m.description == "d1")
  }

  test("robots directives: tokens, case, and the none shorthand") {
    assert(Meta.extract("<meta name=robots content='NOINDEX, follow'>")
      == Meta.PageMeta("", "", "", "", "", "", true, false, 0))
    val none = Meta.extract("<meta name=ROBOTS content=none>")
    assert(none.noindex && none.nofollow)
    val all = Meta.extract("<meta name=robots content='all'>")
    assert(!all.noindex && !all.nofollow)
  }

  test("rel token list, hreflang alternates, base, charset, og:title") {
    val m = Meta.extract(
      """<base href="http://b.example/dir/">
        |<meta charset=UTF-8>
        |<meta property="OG:TITLE" content="Og title">
        |<link rel="alternate stylesheet" href="/s.css">
        |<link rel=alternate hreflang=fr href="/fr">
        |<link rel=ALTERNATE hreflang=de href="/de">""".stripMargin)
    assert(m.baseHref == "http://b.example/dir/")
    assert(m.charset == "utf-8")
    assert(m.ogTitle == "Og title")
    assert(m.nAlternates == 2,
      "rel=alternate without hreflang is not a language alternate")
  }

  test("unclosed title at EOF still lands; empty doc is all-empty") {
    assert(Meta.extract("<title>dangling").title == "dangling")
    assert(Meta.extract("") ==
      Meta.PageMeta("", "", "", "", "", "", false, false, 0))
  }

  test("metaRows: typed map emits one row per document") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq(
      (1L, "<title>One</title><meta name=robots content=noindex>"),
      (2L, "<link rel=canonical href='http://c/2'>")
    ).toDF("doc_id", "page_html")
    val rows = Meta.metaRows(df, "doc_id", "page_html")
      .select("doc_id", "title", "canonical", "noindex")
      .as[(Long, String, String, Boolean)].collect().sortBy(_._1).toList
    assert(rows == List((1L, "One", "", true), (2L, "", "http://c/2", false)))
  }
}
