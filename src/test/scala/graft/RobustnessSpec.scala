package graft

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Extractor
import graft.pdf.PdfParser

/** Adversarial-input regressions: pathological crawled payloads must
  * fail the DOCUMENT (status=error/empty), never the task — no
  * StackOverflowError, no OOM, no hang. */
class RobustnessSpec extends AnyFunSuite {

  private val ts = new Timestamp(0)

  test("50k-deep nested tags flatten at the depth cap instead of overflowing the stack") {
    val html = "<html><body><main>" + ("<b>" * 50000) + "deep text here" +
      ("</b>" * 50000) + "</main></body></html>"
    val r = Extractor.extract("u", ts, html.getBytes(StandardCharsets.UTF_8), "en")
    assert(Seq("ok", "empty", "error").contains(r.status))
  }

  test("colspan bomb is clamped, not materialized") {
    val html = """<html><body><main><p>Some real paragraph content with enough
      |words to classify as content for the extraction gate here.</p>
      |<table><tr><td colspan="2000000000">x</td></tr>
      |<tr><td>1</td><td>2</td></tr></table></main></body></html>""".stripMargin
    val r = Extractor.extract("u", ts, html.getBytes(StandardCharsets.UTF_8), "en")
    assert(r.status == "ok")
    assert(r.tables.head.data.head.length <= 512)
  }

  test("rowspan bomb is clamped and carried values stay bounded") {
    val html = """<html><body><main><p>Some real paragraph content with enough
      |words to classify as content for the extraction gate here.</p>
      |<table><tr><td rowspan="2000000000">x</td><td>a</td></tr>
      |<tr><td>b</td></tr><tr><td>c</td></tr></table></main></body></html>""".stripMargin
    val r = Extractor.extract("u", ts, html.getBytes(StandardCharsets.UTF_8), "en")
    assert(r.status == "ok")
    val t = r.tables.head
    assert(t.rows <= 4)
    // the rowspan cell's value carries into the later rows' first column
    assert(t.data.forall(_.length <= 512))
  }

  test("rowspan carries cell values down into spanned rows") {
    val dom = graft.html.DomBuilder.parse(
      """<table><tr><td rowspan="2">A</td><td>B</td></tr><tr><td>C</td></tr></table>""")
    val m = graft.html.HtmlTables.extract(dom)
    assert(m.head == Vector(Vector("A", "B"), Vector("A", "C")))
  }

  test("cyclic indirect references resolve to null, not infinite recursion") {
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj 3 0 R endobj\n" +
      "3 0 obj 2 0 R endobj\n" +
      "%%EOF").getBytes(StandardCharsets.US_ASCII)
    val doc = PdfParser.parse(pdf)
    assert(doc.status == "ok" || doc.status == "error") // must return, not crash
    assert(doc.pages.isEmpty)
  }

  test("cyclic /Kids page tree terminates") {
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [2 0 R] /Count 1 >> endobj\n" +
      "%%EOF").getBytes(StandardCharsets.US_ASCII)
    val doc = PdfParser.parse(pdf)
    assert(doc.pages.isEmpty)
  }

  test("content stream of 100k garbage bytes tokenizes in a loop, not recursion") {
    val junk = ")" * 100000
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${junk.length} >>\nstream\n$junk\nendstream\nendobj\n" +
      "%%EOF").getBytes(StandardCharsets.ISO_8859_1)
    val doc = PdfParser.parse(pdf)
    assert(doc.status == "ok")
    assert(doc.pages.length == 1)
  }

  test("deeply nested array object is rejected per-object, not with a stack overflow") {
    val nested = "[" * 10000 + "]" * 10000
    val pdf = ("%PDF-1.4\n" +
      s"1 0 obj $nested endobj\n" +
      "%%EOF").getBytes(StandardCharsets.US_ASCII)
    val doc = PdfParser.parse(pdf) // malformed object skipped by scanObjects
    assert(doc.status == "ok" || doc.status == "error")
  }

  test("PDF syntax inside a stream body does not shadow real objects") {
    // object 5's stream body contains text that LOOKS like a redefinition
    // of object 1; honoring /Length + skipping stream bodies must keep
    // the real catalog
    val evil = "1 0 obj << /Type /Catalog /Pages 99 0 R >> endobj"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 33 >>\nstream\nBT /F1 12 Tf (real text) Tj ET\nendstream\nendobj\n" +
      s"5 0 obj << /Length ${evil.length} >>\nstream\n$evil\nendstream\nendobj\n" +
      "%%EOF").getBytes(StandardCharsets.ISO_8859_1)
    val doc = PdfParser.parse(pdf)
    assert(doc.status == "ok")
    assert(doc.pages.length == 1, "ghost catalog must not replace the real page tree")
    assert(doc.pages.head.text == "real text")
  }

  test("table-only HTML page keeps its tables and title on the empty-status row") {
    val html = """<html><head><title>Only Tables</title></head><body>
      |<table><tr><td>Qty</td><td>Price</td></tr>
      |<tr><td>2</td><td>$5.00</td></tr></table></body></html>""".stripMargin
    val r = Extractor.extract("u", ts, html.getBytes(StandardCharsets.UTF_8), "en")
    assert(r.status == "empty") // no main-content prose
    assert(r.title == "Only Tables")
    assert(r.tables.nonEmpty)
    assert(r.tables.head.data == Seq(Seq("Qty", "Price"), Seq("2", "$5.00")))
  }
}
