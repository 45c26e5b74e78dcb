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

  test("PDF 1.5 compressed object streams (ObjStm) expose the page tree") {
    // catalog/pages/page dicts live INSIDE a FlateDecode /ObjStm; only
    // the content stream and the ObjStm itself are top-level objects
    val o1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val o2 = "<< /Type /Pages /Kids [4 0 R] /Count 1 >>"
    val o4 = "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 5 0 R >>"
    val body = o1 + " " + o2 + " " + o4
    val header = s"1 0 2 ${o1.length + 1} 4 ${o1.length + 1 + o2.length + 1} "
    val plain = (header + body).getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput(plain); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) { val k = d.deflate(buf); out.write(buf, 0, k) }
      d.end(); out.toByteArray
    }
    val content = "BT /F1 12 Tf 1 0 0 1 72 700 Tm (hello from objstm) Tj ET"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w(s"5 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    w(s"6 0 obj << /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Filter /FlateDecode /Length ${defl.length} >> stream\n")
    out.write(defl)
    w("\nendstream endobj\n")
    w("trailer << /Size 7 /Root 1 0 R >>\n%%EOF\n")
    val doc = PdfParser.parse(out.toByteArray)
    assert(doc.status == "ok")
    assert(doc.pages.length == 1)
    assert(doc.pages.head.text == "hello from objstm")
  }

  test("image coverage from CTM-tracked Do placements (R1)") {
    // MediaBox 612x792 = 484704 pt²; a 500x500 placement covers ~0.516
    val doc = PdfParser.parse(PdfWriter.build(Seq(Seq("x")),
      imagePlacements = Map(0 -> Seq((50.0, 100.0, 500.0, 500.0)))))
    assert(doc.status == "ok")
    assert(doc.pages.head.imageCount == 1)
    assert(math.abs(doc.pages.head.imageCoverage - 500.0 * 500 / (612 * 792)) < 1e-9)
    // two placements accumulate; declared-but-unplaced stays 0.0
    val two = PdfParser.parse(PdfWriter.build(Seq(Seq("x")),
      imagePlacements = Map(0 -> Seq((0.0, 0.0, 100.0, 100.0), (200.0, 200.0, 100.0, 100.0)))))
    assert(math.abs(two.pages.head.imageCoverage - 2 * 100.0 * 100 / (612 * 792)) < 1e-9)
    val declaredOnly = PdfParser.parse(PdfWriter.build(Seq(Seq("x")), imagePages = Set(0)))
    assert(declaredOnly.pages.head.imageCount == 1)
    assert(declaredOnly.pages.head.imageCoverage == 0.0)
  }

  test("q/Q restore the CTM around placements; coverage clamps at 1.0") {
    // nested q 2x-scale q placement Q Q then an unscaled placement:
    // first Do under cm(2x) doubles each dimension → 4x the area
    val content =
      "q 2 0 0 2 0 0 cm q 100 0 0 100 10 10 cm /Im1 Do Q Q\n" +
      "q 100 0 0 100 10 10 cm /Im1 Do Q\n"
    val pdf = rawPdfWithImage(content)
    val doc = PdfParser.parse(pdf)
    assert(doc.status == "ok")
    val expected = (4 * 100.0 * 100 + 100.0 * 100) / (612 * 792)
    assert(math.abs(doc.pages.head.imageCoverage - expected) < 1e-9)
    // a page-sized placement clamps to 1.0
    val full = PdfParser.parse(rawPdfWithImage("q 2000 0 0 2000 0 0 cm /Im1 Do Q\n"))
    assert(full.pages.head.imageCoverage == 1.0)
  }

  private def rawPdfWithImage(content: String): Array[Byte] = {
    val s = new StringBuilder
    s.append("%PDF-1.4\n")
    s.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    s.append("2 0 obj << /Type /Pages /MediaBox [0 0 612 792] /Kids [3 0 R] /Count 1 >> endobj\n")
    // MediaBox inherited from the Pages parent (spec behavior)
    s.append("3 0 obj << /Type /Page /Parent 2 0 R " +
      "/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    s.append(s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    s.append("5 0 obj << /Type /XObject /Subtype /Image /Width 2 /Height 2 " +
      "/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 4 >> stream\nABCD\nendstream endobj\n")
    s.append("trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n")
    s.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
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
