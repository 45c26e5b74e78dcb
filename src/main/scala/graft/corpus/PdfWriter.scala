package graft.corpus

import java.nio.charset.StandardCharsets

/** Minimal deterministic PDF writer for the fixture corpus (FIXTURES.md §1):
  * classic xref, 1–3 pages, one uncompressed (or FlateDecode) content
  * stream per page using Td/Tj text ops at descending y positions — the
  * closed-world subset graft.pdf.PdfParser documents. Optionally embeds an
  * AcroForm /FT /Sig field (signature-detection fixtures, SURVEY.md E6). */
object PdfWriter {

  /** Escape a PDF literal string. */
  private def esc(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val k = d.deflate(buf); out.write(buf, 0, k) }
    d.end()
    out.toByteArray
  }

  /** Table layout constants (ruled-grid fixtures, SURVEY.md E9). */
  val TableTop = 400.0
  val TableLeft = 72.0
  val RowH = 20.0
  val ColW = 100.0

  /** Content-stream ops for a ruled table: grid lines as thin filled
    * `re` rects + one text run per non-empty cell. Cell (r, c) baseline
    * sits inside row band r, column band c, so PdfTables.detect
    * reconstructs the matrix exactly. */
  private def tableOps(matrix: Seq[Seq[String]], ruled: Boolean = true): String = {
    val nRows = matrix.length
    val nCols = if (matrix.isEmpty) 0 else matrix.map(_.length).max
    val sb = new StringBuilder
    if (ruled) {
      // horizontal rules (nRows+1) and vertical rules (nCols+1)
      (0 to nRows).foreach { i =>
        val y = TableTop - i * RowH
        sb.append(s"${fmt(TableLeft)} ${fmt(y - 0.5)} ${fmt(nCols * ColW)} 1 re f\n")
      }
      (0 to nCols).foreach { j =>
        val x = TableLeft + j * ColW
        sb.append(s"${fmt(x - 0.5)} ${fmt(TableTop - nRows * RowH)} 1 ${fmt(nRows * RowH)} re f\n")
      }
    }
    sb.append("BT\n/F1 10 Tf\n")
    matrix.zipWithIndex.foreach { case (row, r) =>
      row.zipWithIndex.foreach { case (cell, c) =>
        if (cell.nonEmpty) {
          val x = TableLeft + c * ColW + 4
          val y = TableTop - r * RowH - 14
          sb.append(s"1 0 0 1 ${fmt(x)} ${fmt(y)} Tm\n(${esc(cell)}) Tj\n")
        }
      }
    }
    sb.append("ET\n")
    sb.toString
  }

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  /** Build a PDF whose page texts are `pages` (each page = list of lines,
    * ASCII). Line i of a page is shown at y = 720 - 14*i via Td/Tj, so
    * reading order (and thus extracted text) is the given line order.
    * `table` draws a ruled grid + cell text on page 1 (below the lines,
    * so it extracts after them). */
  /** `imagePlacements`: page index → (x, y, w, h) rects; each emits a
    * `q w 0 0 h x y cm /Im1 Do Q` placement of the shared image XObject,
    * so PdfParser's CTM tracking sees real image coverage (R1 fixtures).
    * Pages listed only in `imagePages` declare the XObject without
    * placing it (coverage 0, count 1 — the legacy fixture shape). */
  def build(pages: Seq[Seq[String]], flate: Boolean = false,
      withSignature: Boolean = false,
      table: Option[Seq[Seq[String]]] = None,
      // like `table` but with no grid rules drawn — the
      // whitespace-aligned (unruled) detection fixture
      unruledTable: Option[Seq[Seq[String]]] = None,
      imagePages: Set[Int] = Set.empty,
      imagePlacements: Map[Int, Seq[(Double, Double, Double, Double)]] = Map.empty,
      // page → (x, y, w, h) filled rects drawn OUTSIDE any table — the
      // vector-drawing fixtures for the E7 signature-drawings check
      drawnRects: Map[Int, Seq[(Double, Double, Double, Double)]] = Map.empty)
      : Array[Byte] = {
    val nPages = pages.length
    // object numbering: 1 catalog, 2 pages, 3 font, then per page: page
    // obj, content obj; then optional sig field, optional shared image
    val pageObjNums = (0 until nPages).map(i => 4 + i * 2)
    val contentObjNums = (0 until nPages).map(i => 5 + i * 2)
    val sigObjNum = 4 + nPages * 2
    val imgObjNum = sigObjNum + (if (withSignature) 1 else 0)

    val objs = scala.collection.mutable.LinkedHashMap.empty[Int, Array[Byte]]
    val acro = if (withSignature) s" /AcroForm << /Fields [$sigObjNum 0 R] >>" else ""
    objs(1) = s"<< /Type /Catalog /Pages 2 0 R$acro >>".getBytes(StandardCharsets.US_ASCII)
    objs(2) = s"<< /Type /Pages /Kids [${pageObjNums.map(n => s"$n 0 R").mkString(" ")}] /Count $nPages >>"
      .getBytes(StandardCharsets.US_ASCII)
    objs(3) = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>".getBytes(StandardCharsets.US_ASCII)

    pages.zipWithIndex.foreach { case (lines, i) =>
      val xobj =
        if (imagePages.contains(i) || imagePlacements.contains(i))
          s" /XObject << /Im1 $imgObjNum 0 R >>" else ""
      objs(pageObjNums(i)) =
        (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
         s"/Resources << /Font << /F1 3 0 R >>$xobj >> /Contents ${contentObjNums(i)} 0 R >>")
          .getBytes(StandardCharsets.US_ASCII)
      val content = new StringBuilder
      imagePlacements.getOrElse(i, Nil).foreach { case (x, y, w, h) =>
        content.append(s"q ${fmt(w)} 0 0 ${fmt(h)} ${fmt(x)} ${fmt(y)} cm /Im1 Do Q\n")
      }
      drawnRects.getOrElse(i, Nil).foreach { case (x, y, w, h) =>
        content.append(s"${fmt(x)} ${fmt(y)} ${fmt(w)} ${fmt(h)} re f\n")
      }
      content.append("BT\n/F1 12 Tf\n")
      lines.zipWithIndex.foreach { case (line, j) =>
        val y = 720 - 14 * j
        content.append(s"1 0 0 1 72 $y Tm\n(${esc(line)}) Tj\n")
      }
      content.append("ET\n")
      if (i == 0) table.foreach(m => content.append(tableOps(m)))
      if (i == 0) unruledTable.foreach(m => content.append(tableOps(m, ruled = false)))
      val raw = content.toString.getBytes(StandardCharsets.ISO_8859_1)
      val (data, filter) = if (flate) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      val head = s"<< /Length ${data.length}$filter >>\nstream\n".getBytes(StandardCharsets.US_ASCII)
      val tail = "\nendstream".getBytes(StandardCharsets.US_ASCII)
      objs(contentObjNums(i)) = head ++ data ++ tail
    }

    if (withSignature) {
      objs(sigObjNum) =
        "<< /FT /Sig /T (Signature1) /Type /Annot /Subtype /Widget /Rect [100 100 300 150] >>"
          .getBytes(StandardCharsets.US_ASCII)
    }

    if (imagePages.nonEmpty || imagePlacements.nonEmpty) {
      // 8x8 DeviceGray image XObject (scanned-page fixtures for R1):
      // deterministic ramp pixels, uncompressed
      val px = Array.tabulate[Byte](64)(k => (k * 4).toByte)
      objs(imgObjNum) =
        ("<< /Type /XObject /Subtype /Image /Width 8 /Height 8 " +
         s"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length ${px.length} >>\nstream\n")
          .getBytes(StandardCharsets.US_ASCII) ++ px ++
        "\nendstream".getBytes(StandardCharsets.US_ASCII)
    }

    val out = new java.io.ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.US_ASCII))
    w("%PDF-1.4\n")
    val offsets = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    objs.foreach { case (num, body) =>
      offsets(num) = out.size()
      w(s"$num 0 obj\n")
      out.write(body)
      w("\nendobj\n")
    }
    val xrefPos = out.size()
    val maxObj = objs.keys.max
    w(s"xref\n0 ${maxObj + 1}\n")
    w("0000000000 65535 f \n")
    (1 to maxObj).foreach { num =>
      offsets.get(num) match {
        case Some(off) => w(f"$off%010d 00000 n \n")
        case None => w("0000000000 65535 f \n")
      }
    }
    w(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }
}
