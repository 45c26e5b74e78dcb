package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.html.Template

/** Template-fingerprint invariances pinned for the `template_clusters`
  * oracle. */
class TemplateSpec extends AnyFunSuite {

  test("structure: tags in order, end tags /-prefixed, case-folded") {
    assert(Template.structure(
      "<HTML><Body><p>hi</p></Body></HTML>") ==
      "html>body>p>/p>/body>/html")
    assert(Template.structure("no tags at all") == "")
  }

  test("text, comments, attributes, attribute order never contribute") {
    val a = Template.fingerprint(
      "<html><body class='x' id=\"1\"><p>alpha</p><!-- c --></body></html>")
    val b = Template.fingerprint(
      "<html><body id=\"2\" class='y'><p>completely different</p></body></html>")
    assert(a == b, "same template must hash identically")
    val c = Template.fingerprint("<html><body><div>alpha</div></body></html>")
    assert(a != c, "different structure must hash differently")
  }

  test("fingerprint matches the hand-rolled polynomial") {
    val s = "html>p>/p>/html"
    var h = 0L
    s.foreach(ch => h = (h * 131L + ch.toLong) % 2147483647L)
    assert(Template.fingerprint("<html><p>x</p></html>") == h)
    assert(Template.fingerprint("plain text") == 0L)
  }

  test("templateRows: typed map emits hash + start-tag count") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq(
      (1L, "<html><body><p>a</p></body></html>"),
      (2L, "<html><body><p>b</p></body></html>"),
      (3L, "<div><span>c</span></div>")
    ).toDF("doc_id", "page_html")
    val rows = Template.templateRows(df, "doc_id", "page_html")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows(0)._2 == rows(1)._2, "same template, same hash")
    assert(rows(0)._2 != rows(2)._2)
    assert(rows(0)._3 == 3L && rows(2)._3 == 2L)
  }
}
