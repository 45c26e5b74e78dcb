package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.CorpusGen
import graft.extract.Extractor

/** The north-rule contract: byte-identical extracted text per url over
  * the synthesized corpus (FIXTURES.md §2). Runs the extractor directly
  * (no Spark session) over 300 rows covering every payload-mix bucket. */
class ByteIdentitySpec extends AnyFunSuite {

  private val N = 1000L

  test("byte-identity: extracted fullText equals the expected contract per url") {
    var checked = 0
    var skipped = 0
    (0L until N).foreach { i =>
      val row = CorpusGen.row(i)
      val result = Extractor.extract(row.url, row.warc_ts, row.html, row.lang)
      CorpusGen.expectedText(i) match {
        case Some(expected) =>
          assert(result.fullText == expected,
            s"\nurl=${row.url} (i=$i, bucket=${i % 100})\n--- expected ---\n${preview(expected)}\n--- got ---\n${preview(result.fullText)}\n")
          checked += 1
        case None =>
          // no contract (corrupt/gated inputs) — must not crash, must
          // report a machine-readable status
          assert(Set("ok", "error", "empty", "unsupported").contains(result.status))
          skipped += 1
      }
    }
    assert(checked >= 280, s"checked=$checked skipped=$skipped")
  }

  test("spans index into fullText exactly (pages/blocks/lines store no text)") {
    (0L until 100L).foreach { i =>
      val row = CorpusGen.row(i)
      val result = Extractor.extract(row.url, row.warc_ts, row.html, row.lang)
      val ft = result.fullText
      // page slices joined with the page break reconstruct fullText
      // byte-for-byte — the defining invariant of the span-only tree
      if (result.pages.nonEmpty) {
        val rebuilt = result.pages
          .map(p => ft.substring(p.start, p.end))
          .mkString(Extractor.PageBreak)
        assert(rebuilt == ft, s"page-slice reconstruction mismatch url=${row.url}")
      }
      result.pages.foreach { p =>
        var prevBlockEnd = p.start
        p.blocks.foreach { b =>
          assert(b.start >= prevBlockEnd && b.end <= p.end && b.start <= b.end,
            s"block span out of order/bounds url=${row.url}")
          // the gap between consecutive blocks is pure whitespace (blocks
          // compose the page text joined by "\n")
          assert(ft.substring(prevBlockEnd, b.start).forall(_.isWhitespace),
            s"non-whitespace between blocks url=${row.url}")
          prevBlockEnd = b.end
          var prevLineEnd = b.start
          b.lines.foreach { l =>
            assert(l.start >= prevLineEnd && l.end <= b.end && l.start < l.end,
              s"line span out of order/bounds url=${row.url}")
            val lt = ft.substring(l.start, l.end)
            // lines are stripped: no leading/trailing Python whitespace
            assert(!graft.analyzers.PyText.isPyWs(lt.head) &&
                   !graft.analyzers.PyText.isPyWs(lt.last),
              s"line not stripped url=${row.url}")
            prevLineEnd = l.end
          }
        }
      }
    }
  }

  test("line numbers are 1-based consecutive per page") {
    val row = CorpusGen.row(0)
    val result = Extractor.extract(row.url, row.warc_ts, row.html, row.lang)
    result.pages.foreach { p =>
      val nums = p.blocks.flatMap(_.lines).map(_.lineNumber)
      assert(nums == (1 to nums.length))
    }
  }

  test("signature fixture rolls up to digitally_signed") {
    val i = 88L
    val row = CorpusGen.row(i)
    val result = Extractor.extract(row.url, row.warc_ts, row.html, row.lang)
    assert(result.signatures.nonEmpty)
    assert(result.signatureStatus == "digitally_signed" || result.signatureStatus == "both")
  }

  test("E7: PDF handwritten signature needs a drawing below the label") {
    import graft.corpus.PdfWriter
    val label = Seq(Seq("Signature:")) // run at (72, 720)
    // signature line drawn inside the search band (x∈[52,282], y∈[660,720])
    val signed = PdfWriter.build(label,
      drawnRects = Map(0 -> Seq((100.0, 680.0, 120.0, 2.0))))
    val rs = Extractor.extract("u://sig", new java.sql.Timestamp(0), signed, "en")
    assert(rs.signatureStatus == "manually_signed",
      s"label + drawing below must flag handwritten, got ${rs.signatureStatus}")
    // the label alone — "mentions signature" ≠ "has a signature region"
    val unsigned = Extractor.extract("u://nosig", new java.sql.Timestamp(0),
      PdfWriter.build(label), "en")
    assert(unsigned.signatureStatus == "unsigned")
    // a drawing OUTSIDE the 60pt-below band does not flag
    val farRect = Extractor.extract("u://far", new java.sql.Timestamp(0),
      PdfWriter.build(label, drawnRects = Map(0 -> Seq((400.0, 100.0, 50.0, 2.0)))), "en")
    assert(farRect.signatureStatus == "unsigned")
    // HTML keeps the text-pattern path (no vector geometry exists there);
    // the paragraph is long enough to classify as main content
    val html = "<html><body><p>Please add your signature here today so that " +
      "the agreement between both parties becomes effective and the terms " +
      "described in the preceding sections can be executed as written.</p></body></html>"
    val rh = Extractor.extract("u://html", new java.sql.Timestamp(0),
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8), "en")
    assert(rh.signatureStatus == "manually_signed")
  }

  test("empty payloads report empty status with empty text") {
    Seq(90L, 91L).foreach { i =>
      val row = CorpusGen.row(i)
      val result = Extractor.extract(row.url, row.warc_ts, row.html, row.lang)
      assert(result.status == "empty")
      assert(result.fullText == "")
    }
  }

  test("image payloads are gated to status unsupported with the sniffed format (S3/S8)") {
    val expect = Map(92L -> "png", 93L -> "jpg", 94L -> "gif")
    expect.foreach { case (i, fmt) =>
      val row = CorpusGen.row(i)
      val result = Extractor.extract(row.url, row.warc_ts, row.html, row.lang)
      assert(result.status == "unsupported", s"i=$i")
      assert(result.format == fmt, s"i=$i got ${result.format}")
      assert(result.fullText == "")
    }
    // raw magic sniffing for the formats not in the corpus mix
    assert(Extractor.sniffFormat(Array('R', 'I', 'F', 'F', 0, 0, 0, 0,
      'W', 'E', 'B', 'P').map(_.toByte)) == "webp")
    assert(Extractor.sniffFormat(Array[Byte]('I', 'I', 0x2A, 0)) == "tiff")
    assert(Extractor.sniffFormat(Array[Byte]('M', 'M', 0, 0x2A)) == "tiff")
    assert(Extractor.sniffFormat("BM1234".getBytes) == "bmp")
  }

  test("BOM-ed and UTF-16 payloads decode to the same text as plain UTF-8") {
    import java.nio.charset.StandardCharsets
    val html = "<html><body><main><h1>Title here</h1>" +
      "<p>Contrat numéro 42 — paiement reçu. The agreement between both " +
      "parties becomes effective today and the terms described in the " +
      "preceding sections shall be executed as they were written down.</p>" +
      "</main></body></html>"
    val plain = Extractor.extract("u:plain", new java.sql.Timestamp(0L),
      html.getBytes(StandardCharsets.UTF_8), "fr")
    assert(plain.status == "ok" && plain.fullText.contains("numéro"))
    val cases = Seq(
      "utf8-bom" -> (Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        html.getBytes(StandardCharsets.UTF_8)),
      // UTF_16 charset writes the BOM itself (BE by default)
      "utf16-be-bom" -> html.getBytes(StandardCharsets.UTF_16),
      "utf16-le-bom" -> (Array(0xFF.toByte, 0xFE.toByte) ++
        html.getBytes(StandardCharsets.UTF_16LE)))
    cases.foreach { case (name, bytes) =>
      val r = Extractor.extract(s"u:$name", new java.sql.Timestamp(0L), bytes, "fr")
      assert(r.status == "ok", s"$name status=${r.status}")
      assert(r.fullText == plain.fullText,
        s"$name: decoded text diverges from the UTF-8 baseline")
    }
    // a UTF-16LE page with no BOM handling would be NUL-riddled mojibake;
    // the regression guard: no NULs survive the decode
    val le = Array(0xFF.toByte, 0xFE.toByte) ++ html.getBytes(StandardCharsets.UTF_16LE)
    assert(!Extractor.extract("u:le", new java.sql.Timestamp(0L), le, "fr")
      .fullText.contains('\u0000'))
  }

  test("R1/R2 end-to-end: scanned and mixed-resource PDF fixtures") {
    // bucket 83: image-only page, no text layer → image_with_text / pure_scanned
    val scanned = CorpusGen.row(83)
    val rs = Extractor.extract(scanned.url, scanned.warc_ts, scanned.html, scanned.lang)
    assert(rs.status == "ok" && rs.fullText == "")
    assert(rs.pages.map(_.pageType) == Seq("image_with_text"))
    assert(rs.pages.head.imageCount == 1)
    assert(rs.documentStructure == "pure_scanned")
    assert(rs.recommendedStrategy == "full_ocr")
    // bucket 82: digital text page that also carries an image XObject
    val mixed = CorpusGen.row(82)
    val rm = Extractor.extract(mixed.url, mixed.warc_ts, mixed.html, mixed.lang)
    assert(rm.pages.head.imageCount == 1)
    assert(rm.pages.head.pageType == "digital_text") // coverage 0.0 → not significant
    assert(rm.documentStructure == "pure_digital")
  }

  test("R1: coverage branches — mixed_content and coverage-driven scanned_image") {
    import graft.corpus.PdfWriter
    val longLine = "this page has a real digital text layer of well over fifty characters total"
    // text layer + 500x500 placement (coverage ~0.516 > 0.3) → mixed
    val mixedPdf = PdfWriter.build(Seq(Seq(longLine)),
      imagePlacements = Map(0 -> Seq((50.0, 100.0, 500.0, 500.0))))
    val rm = Extractor.extract("u://mixed", new java.sql.Timestamp(0), mixedPdf, "en")
    assert(rm.status == "ok")
    assert(rm.pages.map(_.pageType) == Seq("mixed_content"))
    assert(rm.pages.head.extractionMethod == "hybrid")
    assert(rm.documentStructure == "mixed")
    assert(rm.recommendedStrategy == "hybrid_extraction")
    assert(rm.estimatedTimeSec == 12.0) // 0.05*(1-1) + 10*0 + 12*1
    // no text layer + 600x600 placement (coverage ~0.743 > 0.7) → scanned
    val scanPdf = PdfWriter.build(Seq(Seq.empty),
      imagePlacements = Map(0 -> Seq((6.0, 96.0, 600.0, 600.0))))
    val rs = Extractor.extract("u://scan", new java.sql.Timestamp(0), scanPdf, "en")
    assert(rs.pages.map(_.pageType) == Seq("scanned_image"),
      s"coverage=${rs.pages.head} should take the >0.7 scanned branch, not image_with_text")
    assert(rs.documentStructure == "pure_scanned")
    // classification unit thresholds for the coverage parameter
    assert(Extractor.classifyPage(100, 1, 0.30)._1 == "digital_text") // not > 0.3
    assert(Extractor.classifyPage(100, 1, 0.31)._1 == "mixed_content")
    assert(Extractor.classifyPage(20, 1, 0.70)._1 == "image_with_text") // not > 0.7
    assert(Extractor.classifyPage(20, 1, 0.71)._1 == "scanned_image")
    assert(Extractor.classifyPage(20, 0, 0.71)._1 == "scanned_image")
  }

  test("R1/R2: per-page classification and document_structure roll-up") {
    // digital HTML page → digital_text / pure_digital
    val html = CorpusGen.row(0)
    val r0 = Extractor.extract(html.url, html.warc_ts, html.html, html.lang)
    assert(r0.pages.forall(_.pageType == "digital_text"))
    assert(r0.documentStructure == "pure_digital")
    assert(r0.recommendedStrategy == "direct_extraction")
    assert(r0.estimatedTimeSec == 0.05 * r0.pageCount)
    // classification thresholds (`ocr_engine.py:926-970`)
    assert(Extractor.classifyPage(0, 0) == ("empty", "skip", false, false, false))
    assert(Extractor.classifyPage(9, 0)._1 == "empty")
    assert(Extractor.classifyPage(9, 2)._1 == "image_with_text")
    assert(Extractor.classifyPage(49, 0)._1 == "scanned_image") // sub-threshold text layer
    assert(Extractor.classifyPage(50, 0)._1 == "digital_text")
  }

  test("R4: additive complexity score (`smart_router.py:218-242`)") {
    assert(Extractor.complexityScore(1000, 1, "html", "en") == 50)
    assert(Extractor.complexityScore(1000, 1, "pdf", "en") == 60)
    assert(Extractor.complexityScore(2L * 1024 * 1024, 1, "pdf", "en") == 70)
    assert(Extractor.complexityScore(11L * 1024 * 1024, 60, "pdf", "zh") == 100)
    assert(Extractor.complexityScore(1000, 11, "html", "ar") == 75)
  }

  test("page-break join is the canonical document text (E4)") {
    val i = 72L // multi-page PDF bucket
    val row = CorpusGen.row(i)
    val result = Extractor.extract(row.url, row.warc_ts, row.html, row.lang)
    if (result.pageCount > 1)
      assert(result.fullText.contains("\n\n--- PAGE BREAK ---\n\n"))
  }

  test("analyzers are locale-independent under a tr-TR default locale") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
      // Turkish default locale maps I → ı under toLowerCase() — every
      // hot-path lowercase must pin Locale.ROOT or byte-identity breaks
      val toks = graft.analyzers.TextAnalyzer.tokenize("III TITLE Invoice")
      assert(toks.contains("iii") && toks.contains("title") && toks.contains("invoice"))
      assert(graft.ops.Dedup.simhash64("TITLE INVOICE") ==
             graft.ops.Dedup.simhash64("title invoice"))
      assert(graft.ops.Quality.fingerprint64("INVOICE TOTAL") ==
             graft.ops.Quality.fingerprint64("invoice total"))
    } finally java.util.Locale.setDefault(prev)
  }

  private def preview(s: String): String =
    if (s.length <= 400) s else s.substring(0, 400) + s"...[${s.length} chars]"
}
