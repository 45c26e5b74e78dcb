package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.PdfWriter
import graft.pdf.PdfParser

class PdfSpec extends AnyFunSuite {

  test("round-trip: single uncompressed page") {
    val pdf = PdfWriter.build(Seq(Seq("hello world", "second line", "third line")))
    val doc = PdfParser.parse(pdf)
    assert(doc.status == "ok")
    assert(doc.pages.length == 1)
    assert(doc.pages.head.text == "hello world\nsecond line\nthird line")
  }

  test("round-trip: multi-page with FlateDecode") {
    val pages = Seq(Seq("page one line a", "page one line b"), Seq("page two only line"))
    val doc = PdfParser.parse(PdfWriter.build(pages, flate = true))
    assert(doc.status == "ok")
    assert(doc.pages.map(_.text) == Seq("page one line a\npage one line b", "page two only line"))
  }

  test("escaped chars in literal strings") {
    val doc = PdfParser.parse(PdfWriter.build(Seq(Seq("a (paren) and \\ backslash"))))
    assert(doc.pages.head.text == "a (paren) and \\ backslash")
  }

  test("signature field detected") {
    val doc = PdfParser.parse(PdfWriter.build(Seq(Seq("signed doc")), withSignature = true))
    assert(doc.signatures.map(_.fieldName) == Vector("Signature1"))
    assert(!doc.signatures.head.signed)
  }

  test("page count without extraction") {
    assert(PdfParser.pageCount(PdfWriter.build(Seq(Seq("a"), Seq("b"), Seq("c")))) == 3)
  }

  test("truncated PDF does not throw") {
    val full = PdfWriter.build(Seq(Seq("some text here")))
    val doc = PdfParser.parse(java.util.Arrays.copyOfRange(full, 0, full.length / 3))
    assert(doc.status == "ok" || doc.status == "error") // never throws
  }

  test("TJ arrays concatenate") {
    val content = "BT /F1 12 Tf 1 0 0 1 72 700 Tm [(ab) -120 (cd)] TJ ET"
    val pdf = buildRawContentPdf(content)
    val doc = PdfParser.parse(pdf)
    assert(doc.pages.head.text == "abcd")
  }

  test("Td line advance creates new lines in reading order") {
    val content = "BT /F1 12 Tf 1 0 0 1 72 700 Tm (top) Tj 0 -20 Td (bottom) Tj ET"
    val doc = PdfParser.parse(buildRawContentPdf(content))
    assert(doc.pages.head.text == "top\nbottom")
  }

  private def buildRawContentPdf(content: String): Array[Byte] = {
    val s = new StringBuilder
    s.append("%PDF-1.4\n")
    s.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    s.append("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    s.append("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    s.append(s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    s.append("trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n")
    s.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
