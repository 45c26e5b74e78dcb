package graft.tables

import java.util.regex.Pattern

import graft.analyzers.PyText

/** Enhanced table model + deterministic enrichment (SURVEY.md §2.5
  * V1–V6) — semantics of `idp_pipeline/models/visual_extractor.py`:
  * header detection (:703-755), cell type inference (:785-826),
  * enhanced cells (:757-783), financial/total flags (:840-858), and the
  * HTML/Markdown/CSV reconstruction serializers (:97-163, cell style
  * :218-227). CSV matches Python `csv.writer` QUOTE_MINIMAL with \r\n
  * row terminator.
  *
  * Numeric parsing parity note: Python `float()` accepts "inf"/"nan"
  * and underscore separators; those are rejected here (closed-world
  * fixtures never produce them) — everything else matches.
  */
object Tables {

  // cell types (visual_extractor.py:31-39)
  val Text = "text"; val Number = "number"; val Currency = "currency"
  val Percentage = "percentage"; val Date = "date"; val Empty = "empty"

  final case class EnhancedCell(
      value: String, row: Int, col: Int,
      cellType: String = Text, isHeader: Boolean = false,
      rowSpan: Int = 1, colSpan: Int = 1, confidence: Double = 0.95,
      alignment: String = "left", bold: Boolean = false,
      numericValue: Option[Double] = None, currencySymbol: Option[String] = None)

  final case class EnhancedTable(
      tableId: String, page: Int, rows: Int, cols: Int,
      confidence: Double = 0.95,
      hasHeader: Boolean = false, headerRowCount: Int = 0,
      headers: Seq[String] = Nil,
      data: Seq[Seq[String]] = Nil,
      cells: Seq[EnhancedCell] = Nil,
      hasTotalRow: Boolean = false, isFinancial: Boolean = false,
      caption: Option[String] = None) {

    // (row, col) index built once — a linear cells.find per lookup made
    // toHtml O((rows*cols)^2) on large tables in the extraction hot path
    @transient private lazy val cellIndex: Map[(Int, Int), EnhancedCell] =
      cells.map(c => (c.row, c.col) -> c).toMap

    private def cellAt(r: Int, c: Int): EnhancedCell =
      cellIndex.getOrElse((r, c), {
        val v = if (r < data.length && c < data(r).length) data(r)(c) else ""
        EnhancedCell(v, r, c, cellType = Empty)
      })

    private def cellStyle(cell: EnhancedCell): String = {
      val styles = scala.collection.mutable.ArrayBuffer.empty[String]
      if (cell.alignment != "left") styles += s"text-align: ${cell.alignment}"
      if (cell.bold) styles += "font-weight: bold"
      styles.mkString("; ")
    }

    /** `EnhancedTable.to_html` (visual_extractor.py:97-121). */
    def toHtml: String = {
      val html = scala.collection.mutable.ArrayBuffer(
        """<table border="1" cellpadding="5" cellspacing="0">""")
      caption.foreach(c => html += s"<caption>$c</caption>")
      for (r <- 0 until rows) {
        html += "<tr>"
        for (c <- 0 until cols) {
          val cell = cellAt(r, c)
          val tag = if (cell.isHeader) "th" else "td"
          val style = cellStyle(cell)
          var attrs = if (style.nonEmpty) s""" style="$style"""" else ""
          if (cell.rowSpan > 1) attrs += s""" rowspan="${cell.rowSpan}""""
          if (cell.colSpan > 1) attrs += s""" colspan="${cell.colSpan}""""
          html += s"<$tag$attrs>${cell.value}</$tag>"
        }
        html += "</tr>"
      }
      html += "</table>"
      html.mkString("\n")
    }

    /** `to_markdown` (visual_extractor.py:123-143). */
    def toMarkdown: String = {
      if (data.isEmpty) return ""
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      val startRow =
        if (hasHeader && headers.nonEmpty) {
          lines += "| " + headers.mkString(" | ") + " |"
          lines += "|" + headers.map(_ => "---").mkString("|") + "|"
          headerRowCount
        } else 0
      for (r <- startRow until data.length)
        lines += "| " + data(r).map(c => if (c == null) "" else c).mkString(" | ") + " |"
      lines.mkString("\n")
    }

    /** `to_csv` (visual_extractor.py:145-162): Python csv.writer,
      * QUOTE_MINIMAL, CRLF terminator. */
    def toCsv: String = {
      val sb = new java.lang.StringBuilder
      def writeRow(row: Seq[String]): Unit = {
        sb.append(row.map(csvField).mkString(",")).append("\r\n")
      }
      if (hasHeader && headers.nonEmpty) {
        writeRow(headers)
        data.drop(headerRowCount).foreach(writeRow)
      } else data.foreach(writeRow)
      sb.toString
    }

    /** `to_dict` (visual_extractor.py:164-203) as a JSON string with the
      * same key order, including the reconstruction forms. */
    def toJson: String = {
      import graft.analyzers.PyJson.{jsString => js, floatRepr => jnum}
      val cellsJson = cells.map { c =>
        s"""{"value": ${js(c.value)}, "row": ${c.row}, "col": ${c.col}, """ +
        s""""cell_type": ${js(c.cellType)}, "is_header": ${c.isHeader}, """ +
        s""""row_span": ${c.rowSpan}, "col_span": ${c.colSpan}, """ +
        s""""confidence": ${jnum(c.confidence)}, "alignment": ${js(c.alignment)}, """ +
        s""""bold": ${c.bold}, """ +
        s""""numeric_value": ${c.numericValue.map(jnum).getOrElse("null")}, """ +
        s""""currency_symbol": ${c.currencySymbol.map(js).getOrElse("null")}}"""
      }.mkString("[", ", ", "]")
      val dataJson = data.map(_.map(js).mkString("[", ", ", "]")).mkString("[", ", ", "]")
      s"""{"table_id": ${js(tableId)}, "page": $page, "rows": $rows, "cols": $cols, """ +
      s""""confidence": ${jnum(confidence)}, "has_header": $hasHeader, """ +
      s""""header_row_count": $headerRowCount, """ +
      s""""headers": ${headers.map(js).mkString("[", ", ", "]")}, """ +
      s""""data": $dataJson, "cells": $cellsJson, """ +
      s""""has_total_row": $hasTotalRow, "is_financial": $isFinancial, """ +
      s""""caption": ${caption.map(js).getOrElse("null")}, """ +
      s""""reconstruction": {"html": ${js(toHtml)}, "markdown": ${js(toMarkdown)}, "csv": ${js(toCsv)}}}"""
    }
  }

  /** Python csv QUOTE_MINIMAL: quote iff the field contains the
    * delimiter, the quote char, or any line-terminator char. */
  private def csvField(s0: String): String = {
    val s = if (s0 == null) "" else s0
    if (s.exists(c => c == ',' || c == '"' || c == '\r' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
  }

  // ------------------------------------------------------- V2 cell typing

  /** Currency patterns (visual_extractor.py:590-597); matched with
    * lookingAt (= Python re.match: anchored at start only). */
  private val currencyPatterns: Seq[(Pattern, String)] = Seq(
    ("^\\$[\\d,]+\\.?\\d*$", "$"),
    ("^€[\\d,]+\\.?\\d*$", "€"),
    ("^£[\\d,]+\\.?\\d*$", "£"),
    ("^[\\d,]+\\.?\\d*\\s*€$", "€"),
    ("^[\\d,]+\\.?\\d*\\s*\\$", "$"),
    ("^[\\d\\s]+,?\\d*\\s*€$", "€")) // French format
    .map { case (p, sym) => (Pattern.compile(p), sym) }

  private val percentagePattern = Pattern.compile("^[\\d,\\.]+\\s*%$")

  private val datePatterns: Seq[Pattern] = Seq(
    "\\d{1,2}[/\\-]\\d{1,2}[/\\-]\\d{2,4}",
    "\\d{4}[/\\-]\\d{1,2}[/\\-]\\d{1,2}",
    "\\d{1,2}\\s+\\w+\\s+\\d{4}").map(Pattern.compile)

  private def pyFloat(s: String): Option[Double] = {
    val t = s.trim
    if (t.isEmpty) None
    // parseDouble accepts 'd'/'f' suffixes, hex floats, and
    // "Infinity"/"NaN" that Python float() spells differently — allow
    // letters only for the exponent marker
    else if (t.exists(c => c.isLetter && c != 'e' && c != 'E')) None
    else try Some(java.lang.Double.parseDouble(t))
    catch { case _: NumberFormatException => None }
  }

  /** `_infer_cell_type` (visual_extractor.py:785-826):
    * (cellType, numericValue, currencySymbol). */
  def inferCellType(value0: String): (String, Option[Double], Option[String]) = {
    if (value0 == null || PyText.strip(value0).isEmpty) return (Empty, None, None)
    val value = PyText.strip(value0)

    currencyPatterns.foreach { case (p, sym) =>
      if (p.matcher(value).lookingAt()) {
        val numericStr = value.replaceAll("[^\\d,\\.]", "").replace(',', '.')
        pyFloat(numericStr) match {
          case Some(v) => return (Currency, Some(v), Some(sym))
          case None => // fall through, as the reference does
        }
      }
    }
    if (percentagePattern.matcher(value).lookingAt()) {
      pyFloat(value.replace(',', '.').replaceAll("[^\\d,\\.]", "")) match {
        case Some(v) => return (Percentage, Some(v), None)
        case None =>
      }
    }
    if (datePatterns.exists(_.matcher(value).find()))
      return (Date, None, None)
    pyFloat(value.replace(" ", "").replace(',', '.')) match {
      case Some(v) => (Number, Some(v), None)
      case None => (Text, None, None)
    }
  }

  def inferAlignment(cellType: String): String =
    if (cellType == Number || cellType == Currency || cellType == Percentage) "right"
    else "left"

  // --------------------------------------------------- V1 header detection

  private def hasNumber(s: String): Boolean =
    s != null && s.exists(Character.isDigit)

  private val headerWords = Seq("name", "date", "type", "total", "amount",
    "niveau", "montant", "description", "category", "status", "id", "no",
    "qty", "price")

  /** `_detect_table_headers` (visual_extractor.py:703-755):
    * (hasHeader, headerRowCount, headers). */
  def detectHeaders(data: Seq[Seq[String]]): (Boolean, Int, Seq[String]) = {
    if (data.isEmpty || data.length < 2) return (false, 0, Nil)
    val firstRow = data.head
    var indicators = 0

    val firstRowHasNumbers = firstRow.exists(c => c != null && c.nonEmpty && hasNumber(c))
    val dataRowsHaveNumbers = data.tail.exists(_.exists(c => c != null && c.nonEmpty && hasNumber(c)))
    if (!firstRowHasNumbers && dataRowsHaveNumbers) indicators += 2

    if (firstRow.nonEmpty) {
      val avgFirst = firstRow.collect { case c if c != null && c.nonEmpty => c.length }
        .sum.toDouble / firstRow.length
      var dataLen = 0L; var dataCells = 0
      data.tail.foreach(_.foreach { c =>
        if (c != null && c.nonEmpty) { dataLen += c.length; dataCells += 1 }
      })
      if (dataCells > 0 && avgFirst < (dataLen.toDouble / dataCells) * 0.8)
        indicators += 1
    }

    val firstRowLower = firstRow.collect {
      case c if c != null && c.nonEmpty => c.toLowerCase(java.util.Locale.ROOT)
    }.mkString(" ")
    if (headerWords.exists(firstRowLower.contains)) indicators += 2

    val hasHeader = indicators >= 2
    val headers =
      if (hasHeader) firstRow.zipWithIndex.map { case (c, i) =>
        if (c != null && c.nonEmpty) c else s"Column_$i"
      } else Nil
    (hasHeader, if (hasHeader) 1 else 0, headers)
  }

  // -------------------------------------------------- V3/V4 cells & flags

  /** `_build_enhanced_cells` (visual_extractor.py:757-783). */
  def buildCells(data: Seq[Seq[String]], hasHeader: Boolean,
      headerRowCount: Int): Seq[EnhancedCell] = {
    data.zipWithIndex.flatMap { case (row, r) =>
      val isHeaderRow = hasHeader && r < headerRowCount
      row.zipWithIndex.map { case (v0, c) =>
        val v = if (v0 == null) "" else v0
        val (ct, num, cur) = inferCellType(v)
        EnhancedCell(v, r, c, cellType = ct, isHeader = isHeaderRow,
          alignment = inferAlignment(ct), bold = isHeaderRow,
          numericValue = num, currencySymbol = cur)
      }
    }
  }

  /** `_is_financial_table` (:840-849): ≥2 currency-typed cells. */
  def isFinancial(data: Seq[Seq[String]]): Boolean = {
    var n = 0
    data.foreach(_.foreach { c =>
      if (c != null && c.nonEmpty &&
          currencyPatterns.exists(_._1.matcher(PyText.strip(c)).lookingAt())) n += 1
    })
    n >= 2
  }

  /** `_has_total_row` (:851-858). */
  def hasTotalRow(data: Seq[Seq[String]]): Boolean = {
    if (data.isEmpty) return false
    val last = data.last.collect {
      case c if c != null && c.nonEmpty => c.toLowerCase(java.util.Locale.ROOT)
    }.mkString(" ")
    Seq("total", "sum", "subtotal", "grand total", "totaux", "sous-total")
      .exists(last.contains)
  }

  /** Full enhancement of a raw matrix (extract_tables_enhanced body,
    * visual_extractor.py:626-701). */
  def enhance(matrix: Seq[Seq[String]], page: Int, tableIdx: Int): EnhancedTable = {
    val (hh, hrc, headers) = detectHeaders(matrix)
    EnhancedTable(
      tableId = s"table_p${page}_t$tableIdx",
      page = page,
      rows = matrix.length,
      cols = if (matrix.isEmpty) 0 else matrix.map(_.length).max,
      hasHeader = hh, headerRowCount = hrc, headers = headers,
      data = matrix,
      cells = buildCells(matrix, hh, hrc),
      hasTotalRow = hasTotalRow(matrix),
      isFinancial = isFinancial(matrix))
  }
}
