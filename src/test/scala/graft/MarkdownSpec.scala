package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.html.Markdown

/** Pinned markdown-dialect semantics for the `html_markdown` oracle. */
class MarkdownSpec extends AnyFunSuite {

  test("headings, inline markup, links, head-drop") {
    val html = "<html><head><title>drop me</title></head><body>" +
      "<h1>Doc 7</h1><p>Hello <strong>bold</strong> and <em>it</em> " +
      "plus <code>x=1</code>, see <a href=\"http://e/1\">link</a>.</p>" +
      "<h2>Sect</h2></body></html>"
    assert(Markdown.render(html) ==
      "# Doc 7\n\nHello **bold** and *it* plus `x=1`, see " +
        "[link](http://e/1).\n\n## Sect")
  }

  test("ordered list with nested unordered list indents 2 spaces") {
    val html = "<ol><li>first</li><li>second<ul><li>sub a</li>" +
      "<li>sub b</li></ul></li><li>third</li></ol>"
    assert(Markdown.render(html) ==
      "1. first\n2. second\n  - sub a\n  - sub b\n3. third")
  }

  test("blockquote prefixes every line; empty inner lines become '>'") {
    val html = "<blockquote><p>one</p><p>two</p></blockquote><hr><p>after</p>"
    assert(Markdown.render(html) == "> one\n>\n> two\n\n---\n\nafter")
  }

  test("pre is fenced raw text: no collapse, entities decoded") {
    val html = "<pre>if (a &lt; b) {\n  run(1);\n}</pre>"
    assert(Markdown.render(html) == "```\nif (a < b) {\n  run(1);\n}\n```")
  }

  test("table renders as a GFM pipe table padded to the widest row") {
    val html = "<table><thead><tr><th>k</th><th>v</th></tr></thead>" +
      "<tbody><tr><td>a</td><td>1</td></tr><tr><td>b</td></tr></tbody></table>"
    assert(Markdown.render(html) ==
      "| k | v |\n| --- | --- |\n| a | 1 |\n| b |  |")
  }

  test("script/style dropped; br breaks the line; img keeps alt+src") {
    val html = "<script>var x = \"<p>no</p>\";</script><style>p{}</style>" +
      "<p>line one<br>line two</p>" +
      "<p><img src=\"http://e/i.png\" alt=\"pic\"> tail</p>"
    assert(Markdown.render(html) ==
      "line one\nline two\n\n![pic](http://e/i.png) tail")
  }

  test("href-less anchor keeps bare text; empty emphasis vanishes") {
    assert(Markdown.render("<p><a>bare</a> and <b> </b>end</p>") ==
      "bare and end")
  }

  test("whitespace collapses across inline boundaries") {
    assert(Markdown.render("<p>a\n   <b>x</b>\n b</p>") == "a **x** b")
  }

  test("never throws on malformed markup") {
    assert(Markdown.render("<ul><li>open<blockquote>q") == "- open\n  > q")
    assert(Markdown.render(null) == "")
    assert(Markdown.render("<table><tr></tr></table>") == "")
  }

  test("typed rows surface") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq((1L, "<h1>t</h1>"), (2L, "<p>p</p>"))
      .toDF("doc_id", "page_html")
    val got = Markdown.markdownRows(df, "doc_id", "page_html")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "# t"), (2L, "p")))
  }
}
