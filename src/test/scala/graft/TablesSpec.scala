package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.{CorpusGen, PdfWriter}
import graft.html.{DomBuilder, HtmlTables}
import graft.pdf.{PdfParser, PdfTables}
import graft.tables.Tables

/** Table enhancement V1–V6 + detection E9 (SURVEY.md §2.5). The golden
  * strings below were produced by executing the reference's own
  * `EnhancedTable` serializers (`visual_extractor.py:97-163`) on the same
  * matrix — byte parity, including csv.writer CRLF quoting and the HTML
  * style attributes. */
class TablesSpec extends AnyFunSuite {

  private val goldenMatrix = Seq(
    Seq("Name", "Qty", "Price"),
    Seq("widget", "4", "$12.50"),
    Seq("gadget", "7", "$919.30"),
    Seq("Total", "", "$931.80"))

  test("V1 header detection matches reference heuristics") {
    val (hh, hrc, headers) = Tables.detectHeaders(goldenMatrix)
    assert(hh); assert(hrc == 1)
    assert(headers == Seq("Name", "Qty", "Price"))
    // no header: numeric first row
    val (hh2, _, _) = Tables.detectHeaders(Seq(Seq("1", "2"), Seq("3", "4")))
    assert(!hh2)
    // Column_{i} fill for empty header cells
    val (hh3, _, h3) = Tables.detectHeaders(
      Seq(Seq("name", "", "price"), Seq("a", "1", "2")))
    assert(hh3); assert(h3 == Seq("name", "Column_1", "price"))
  }

  test("V2 cell typing: currency, percentage, date, number, empty, text") {
    assert(Tables.inferCellType("$12.50") == (Tables.Currency, Some(12.5), Some("$")))
    assert(Tables.inferCellType("919.30 €") == (Tables.Currency, Some(919.3), Some("€")))
    // faithful quirk: "1,234.56 €" matches the euro pattern but its
    // comma-stripped float parse fails -> falls through to TEXT,
    // exactly as the reference does (verified against visual_extractor)
    assert(Tables.inferCellType("1,234.56 €")._1 == Tables.Text)
    assert(Tables.inferCellType("12.5%") == (Tables.Percentage, Some(12.5), None))
    assert(Tables.inferCellType("12/31/2026") == (Tables.Date, None, None))
    assert(Tables.inferCellType("2026-01-15") == (Tables.Date, None, None))
    assert(Tables.inferCellType("15 janvier 2026") == (Tables.Date, None, None))
    assert(Tables.inferCellType("1 234,5") == (Tables.Number, Some(1234.5), None))
    assert(Tables.inferCellType("  ") == (Tables.Empty, None, None))
    assert(Tables.inferCellType("hello") == (Tables.Text, None, None))
    // European decimal comma
    assert(Tables.inferCellType("3,14") == (Tables.Number, Some(3.14), None))
  }

  test("V3/V4: enhanced cells + financial/total flags match reference run") {
    val t = Tables.enhance(goldenMatrix, page = 1, tableIdx = 0)
    assert(t.isFinancial && t.hasTotalRow && t.hasHeader)
    val byPos = t.cells.map(c => (c.row, c.col) -> c).toMap
    assert(byPos((1, 2)).cellType == Tables.Currency)
    assert(byPos((1, 2)).numericValue.contains(12.5))
    assert(byPos((1, 2)).currencySymbol.contains("$"))
    assert(byPos((1, 1)).cellType == Tables.Number)
    assert(byPos((1, 1)).alignment == "right")
    assert(byPos((3, 1)).cellType == Tables.Empty)
    assert(byPos((0, 0)).isHeader && byPos((0, 0)).bold)
  }

  test("V5 renders: byte parity with the reference serializers") {
    val t = Tables.enhance(goldenMatrix, page = 1, tableIdx = 0)
    val goldenHtml =
      """<table border="1" cellpadding="5" cellspacing="0">
        |<tr>
        |<th style="font-weight: bold">Name</th>
        |<th style="font-weight: bold">Qty</th>
        |<th style="font-weight: bold">Price</th>
        |</tr>
        |<tr>
        |<td>widget</td>
        |<td style="text-align: right">4</td>
        |<td style="text-align: right">$12.50</td>
        |</tr>
        |<tr>
        |<td>gadget</td>
        |<td style="text-align: right">7</td>
        |<td style="text-align: right">$919.30</td>
        |</tr>
        |<tr>
        |<td>Total</td>
        |<td></td>
        |<td style="text-align: right">$931.80</td>
        |</tr>
        |</table>""".stripMargin
    assert(t.toHtml == goldenHtml)
    val goldenMd = Seq(
      "| Name | Qty | Price |",
      "|---|---|---|",
      "| widget | 4 | $12.50 |",
      "| gadget | 7 | $919.30 |",
      "| Total |  | $931.80 |").mkString("\n")
    assert(t.toMarkdown == goldenMd)
    assert(t.toCsv ==
      "Name,Qty,Price\r\nwidget,4,$12.50\r\ngadget,7,$919.30\r\nTotal,,$931.80\r\n")
  }

  test("V5 CSV quoting: QUOTE_MINIMAL semantics") {
    val t = Tables.enhance(
      Seq(Seq("a,b", "say \"hi\""), Seq("line\nbreak", "plain")), 1, 0)
    assert(t.toCsv == "\"a,b\",\"say \"\"hi\"\"\"\r\n\"line\nbreak\",plain\r\n")
  }

  test("E9: ruled grid in a fixture PDF reconstructs the matrix") {
    val bytes = PdfWriter.build(Seq(Seq("intro line")), table = Some(goldenMatrix))
    val doc = PdfParser.parse(bytes)
    assert(doc.status == "ok")
    val detected = PdfTables.detect(doc.pages.head)
    assert(detected.length == 1)
    assert(detected.head.matrix == goldenMatrix.map(_.toVector).toVector)
    // cell text extracts after the intro line in reading order
    assert(doc.pages.head.text ==
      "intro line\nName Qty Price\nwidget 4 $12.50\ngadget 7 $919.30\nTotal $931.80")
  }

  test("E9: whitespace-aligned (unruled) table detected behind the flag") {
    // same golden matrix, NO grid rules drawn — only x-aligned cell runs
    val totalRow = goldenMatrix.last
    val bytes = PdfWriter.build(Seq(Seq("intro line")),
      unruledTable = Some(goldenMatrix))
    val doc = PdfParser.parse(bytes)
    assert(doc.status == "ok")
    // the ruled detector must NOT fire (no rules exist)...
    assert(PdfTables.detect(doc.pages.head).isEmpty)
    // ...and detectAll without the flag stays ruled-only
    assert(PdfTables.detectAll(doc.pages.head).isEmpty)
    // the unruled detector reconstructs the matrix (the empty Qty cell of
    // the Total row yields an empty column cell, as in the ruled case)
    val detected = PdfTables.detectAll(doc.pages.head, includeUnruled = true)
    assert(detected.length == 1, s"got $detected")
    assert(detected.head.matrix == goldenMatrix.map(_.toVector).toVector)
    // a plain multi-line paragraph page (one run per line) detects nothing
    val prose = PdfParser.parse(PdfWriter.build(Seq(Seq(
      "one line of prose", "another line of prose", "third line here"))))
    assert(PdfTables.detectAll(prose.pages.head, includeUnruled = true).isEmpty)
    // end-to-end through the engine flag
    val withFlag = graft.extract.Extractor.extract("u://unruled",
      new java.sql.Timestamp(0), bytes, "en", unruledTables = true)
    assert(withFlag.tables.length == 1)
    assert(withFlag.tables.head.data.nonEmpty)
    val withoutFlag = graft.extract.Extractor.extract("u://unruled",
      new java.sql.Timestamp(0), bytes, "en")
    assert(withoutFlag.tables.isEmpty)
    assert(totalRow.head == "Total") // fixture shape guard
  }

  test("HTML <table> extraction: thead/tbody, th/td, colspan") {
    val html =
      """<html><body><main><p>text</p>
        |<table>
        | <thead><tr><th>Name</th><th>Qty</th></tr></thead>
        | <tbody>
        |  <tr><td>a <b>bold</b></td><td>1</td></tr>
        |  <tr><td colspan="2">span</td></tr>
        | </tbody>
        |</table></main></body></html>""".stripMargin
    val tables = HtmlTables.extract(DomBuilder.parse(html))
    assert(tables.length == 1)
    assert(tables.head == Vector(
      Vector("Name", "Qty"), Vector("a bold", "1"), Vector("span", "span")))
  }

  test("end-to-end: corpus row k==84 extracts tables through the engine") {
    val i = 84L
    val doc = graft.extract.Extractor.extract(
      CorpusGen.urlOf(i), CorpusGen.tsOf(i), CorpusGen.payload(i), CorpusGen.langOf(i))
    assert(doc.status == "ok")
    assert(doc.tables.length == 1)
    val t = doc.tables.head
    assert(t.hasHeader && t.headers == Seq("Name", "Qty", "Price"))
    assert(t.isFinancial && t.hasTotalRow)
    assert(t.data == CorpusGen.tableMatrix(i))
    assert(t.csv.endsWith("\r\n") && t.html.startsWith("<table"))
    // byte-identity contract still holds for the table row
    assert(doc.fullText == CorpusGen.expectedText(i).get)
  }
}
