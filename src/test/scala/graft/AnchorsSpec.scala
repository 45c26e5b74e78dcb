package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.html.Anchors

/** Anchor extraction: pinned WHATWG-ish semantics for the
  * `anchor_rows` oracle. */
class AnchorsSpec extends AnyFunSuite {

  test("simple anchor: href plus text") {
    assert(Anchors.extract("""<a href="https://e.com/x">click me</a>""") ==
      List("https://e.com/x" -> "click me"))
  }

  test("uppercase tags, single quotes, entity-decoded hrefs") {
    assert(Anchors.extract("""<A HREF='https://e.com/?a=1&amp;b=2'>Go</A>""") ==
      List("https://e.com/?a=1&b=2" -> "Go"))
  }

  test("nested inline markup accumulates into the anchor text") {
    assert(Anchors.extract(
      """<a href="/p">second <i>link</i> here</a>""") ==
      List("/p" -> "second link here"))
  }

  test("a new <a> implicitly closes an open one") {
    assert(Anchors.extract(
      """<a href="/one">first<a href="/two">second</a>""") ==
      List("/one" -> "first", "/two" -> "second"))
  }

  test("end of document closes a dangling anchor") {
    assert(Anchors.extract("""<p><a href="/x">never closed""") ==
      List("/x" -> "never closed"))
  }

  test("anchors without href (or empty href) are skipped") {
    assert(Anchors.extract("""<a name="top">x</a><a href="">y</a>""") ==
      List())
  }

  test("whitespace collapses; entities decode in text") {
    assert(Anchors.extract(
      "<a href=\"/x\">\n  a &amp;\t b  </a>") == List("/x" -> "a & b"))
  }

  test("text outside anchors is ignored; script content never leaks") {
    assert(Anchors.extract(
      """pre <a href="/x">in</a> post<script>var a="no";</script>""") ==
      List("/x" -> "in"))
  }

  test("anchorRows explodes one row per anchor, map-only") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq(
      (1L, """<a href="/a">x</a><a href="/b">y</a>"""),
      (2L, "<p>no links</p>"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "html")
    val rows = Anchors.anchorRows(df, "doc_id", "html")
      .as[(Long, String, String)].collect().toSet
    assert(rows == Set((1L, "/a", "x"), (1L, "/b", "y")))
  }
}
