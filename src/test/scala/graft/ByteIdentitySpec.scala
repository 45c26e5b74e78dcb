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
          // no contract (corrupt inputs) — must not crash, must report status
          assert(result.status == "ok" || result.status == "error" || result.status == "empty")
          skipped += 1
      }
    }
    assert(checked >= 280, s"checked=$checked skipped=$skipped")
  }

  test("spans index into the page rawText exactly") {
    (0L until 100L).foreach { i =>
      val row = CorpusGen.row(i)
      val result = Extractor.extract(row.url, row.warc_ts, row.html, row.lang)
      result.pages.foreach { p =>
        p.blocks.foreach { b =>
          assert(p.rawText.substring(b.start, b.end) == b.text,
            s"block span mismatch url=${row.url}")
          b.lines.foreach { l =>
            assert(p.rawText.substring(l.start, l.end) == l.text,
              s"line span mismatch url=${row.url}")
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

  test("empty payloads report empty status with empty text") {
    Seq(90L, 91L).foreach { i =>
      val row = CorpusGen.row(i)
      val result = Extractor.extract(row.url, row.warc_ts, row.html, row.lang)
      assert(result.status == "empty")
      assert(result.fullText == "")
    }
  }

  test("page-break join is the canonical document text (E4)") {
    val i = 72L // multi-page PDF bucket
    val row = CorpusGen.row(i)
    val result = Extractor.extract(row.url, row.warc_ts, row.html, row.lang)
    if (result.pageCount > 1)
      assert(result.fullText.contains("\n\n--- PAGE BREAK ---\n\n"))
  }

  private def preview(s: String): String =
    if (s.length <= 400) s else s.substring(0, 400) + s"...[${s.length} chars]"
}
