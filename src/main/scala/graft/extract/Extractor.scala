package graft.extract

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import graft.analyzers.{LangScript, PyText, TextAnalyzer}
import graft.html.Boilerplate
import graft.pdf.{PdfParser, PdfTables}

/** Per-document extraction: format sniff → route → parse → assemble the
  * DocResult tree. Pure function of the payload bytes — runs inside a
  * typed Dataset map stage (SURVEY.md §3.4); never throws.
  *
  * Routing mirrors the reference's route-before-compute design
  * (`ocr_engine.py:875-1025,1290-1343`): cheap magic-byte sniff replaces
  * per-page analysis since the heavy branches here are HTML vs PDF.
  * Assembly semantics: page-break join E4 (`ocr_engine.py:1086`), line /
  * block construction E5 (`:1064-1078`), direct-extraction confidence
  * 0.99 (`:1080-1090`), signatures E6-E8 (`:618-771`). */
object Extractor {

  val PageBreak = "\n\n--- PAGE BREAK ---\n\n"
  val DirectConfidence = 0.99

  /** Magic-byte format sniff (SURVEY.md S3, `smart_router.py:146-164`). */
  def sniffFormat(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) return "empty"
    if (startsWith(bytes, "%PDF-")) return "pdf"
    // whitespace-only?
    var i = 0
    var allWs = true
    while (i < bytes.length && allWs) {
      val b = bytes(i)
      if (!(b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f')) allWs = false
      i += 1
    }
    if (allWs) return "empty"
    "html" // default: treat text-ish payloads as HTML (tokenizer degrades to text)
  }

  private def startsWith(bytes: Array[Byte], prefix: String): Boolean = {
    if (bytes.length < prefix.length) return false
    var i = 0
    while (i < prefix.length) {
      if (bytes(i) != prefix.charAt(i)) return false
      i += 1
    }
    true
  }

  private val hexChars = "0123456789abcdef".toCharArray
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("SHA-256"))

  def sha256Hex(bytes: Array[Byte]): String = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(if (bytes == null) Array.emptyByteArray else bytes)
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(i * 2) = hexChars((d(i) >> 4) & 0xF)
      out(i * 2 + 1) = hexChars(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Handwritten-signature text patterns (E7, `ocr_engine.py:669-735` —
    * text-pattern part only; vector-drawing check documented out of scope). */
  private val sigPatterns = Seq("signature", "signed by", "sign here", "per:", "by:", "signé", "firma")

  def extract(url: String, warcTs: Timestamp, payload: Array[Byte], langHint: String): DocResult = {
    val bytes = if (payload == null) Array.emptyByteArray else payload
    val format = sniffFormat(bytes)
    val hash = sha256Hex(bytes)
    try {
      format match {
        case "empty" =>
          emptyResult(url, warcTs, langHint, format, hash, bytes.length)
        case "pdf" =>
          val doc = PdfParser.parse(bytes)
          if (doc.status == "error")
            errorResult(url, warcTs, langHint, format, hash, bytes.length, doc.error)
          else {
            // E9: ruled tables from content-stream grid geometry
            val tables = doc.pages.flatMap(PdfTables.detect(_)).zipWithIndex.map {
              case (t, idx) => toTableOut(t.matrix.map(_.toSeq), t.page, idx)
            }
            assemble(url, warcTs, langHint, format, hash, bytes.length,
              title = "",
              pageTexts = doc.pages.map(_.text),
              pageBlocks = doc.pages.map(p => Vector(("paragraph", p.text))),
              signatures = doc.signatures.map(s => SignatureOut(s.fieldName, s.signed)),
              tables = tables)
          }
        case _ =>
          val htmlStr = new String(bytes, StandardCharsets.UTF_8)
          val dom = graft.html.DomBuilder.parse(htmlStr)
          val blocks = Boilerplate.segment(dom).filter(_.isContent)
          val title = Boilerplate.title(dom)
          val pageText = blocks.map(_.text).mkString("\n")
          val typed = blocks.map { b =>
            val bt = if (b.isHeading) "heading"
                     else if (b.tag == "li" || b.tag == "dd" || b.tag == "dt") "list_item"
                     else if (b.tag == "td" || b.tag == "th") "table_cell"
                     else "paragraph"
            (bt, b.text)
          }
          val htmlTables = graft.html.HtmlTables.extract(dom)
            .filter(_.nonEmpty).zipWithIndex
            .map { case (m, idx) => toTableOut(m.map(_.toSeq), page = 1, idx) }
          if (pageText.isEmpty)
            // table-only pages: no main-content text, but detected tables
            // and the title still belong on the result row
            emptyResult(url, warcTs, langHint, format, hash, bytes.length)
              .copy(title = title, tables = htmlTables)
          else assemble(url, warcTs, langHint, format, hash, bytes.length,
            title = title,
            pageTexts = Vector(pageText),
            pageBlocks = Vector(typed),
            signatures = Vector.empty,
            tables = htmlTables)
      }
    } catch {
      // StackOverflowError is included deliberately: pathological nesting
      // in crawled markup must fail THIS document (per-row failure path,
      // `local_queue.py:359-403`), not the Spark task — by catch time the
      // stack is unwound and the thread is healthy. Genuinely fatal VM
      // errors (OOM etc.) still propagate.
      case e @ (_: Exception | _: StackOverflowError) =>
        errorResult(url, warcTs, langHint, format, hash, bytes.length,
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
    }
  }

  /** Assemble the full DocResult from per-page text + typed blocks.
    * Lines within a block = non-empty stripped '\n'-splits, 1-based per
    * page (E1/E5); spans are char offsets into the page rawText. */
  /** V1–V6 enhancement of a detected raw matrix → flat TableOut row. */
  private def toTableOut(matrix: Seq[Seq[String]], page: Int, idx: Int): TableOut = {
    val t = graft.tables.Tables.enhance(matrix, page, idx)
    TableOut(t.tableId, t.page, t.rows, t.cols, t.hasHeader, t.headers,
      t.data, t.isFinancial, t.hasTotalRow, t.toHtml, t.toMarkdown, t.toCsv)
  }

  private def assemble(url: String, warcTs: Timestamp, langHint: String,
      format: String, hash: String, size: Long, title: String,
      pageTexts: Seq[String], pageBlocks: Seq[Seq[(String, String)]],
      signatures: Seq[SignatureOut], tables: Seq[TableOut] = Nil): DocResult = {

    val fullText = pageTexts.mkString(PageBreak)
    // single tokenize pass shared by the doc-level analyzers AND (for
    // single-page docs, where rawText == fullText) page language-ID
    val tokens = TextAnalyzer.tokenize(fullText)
    val singlePage = pageTexts.length == 1

    val pages = pageTexts.zipWithIndex.map { case (rawText, pi) =>
      var lineNo = 0
      var cursor = 0
      val blocks = pageBlocks(pi).flatMap { case (blockType, blockText) =>
        if (blockText.isEmpty) None
        else {
          val bStart = rawText.indexOf(blockText, cursor)
          val start = if (bStart >= 0) bStart else cursor
          val end = start + blockText.length
          cursor = end
          val lines = scala.collection.mutable.ArrayBuffer.empty[LineOut]
          var lineCursor = start
          PyText.splitKeepEmpty(blockText, "\n").foreach { rawLine =>
            val stripped = PyText.strip(rawLine)
            if (stripped.nonEmpty) {
              lineNo += 1
              val ls = rawText.indexOf(stripped, lineCursor)
              val lStart = if (ls >= 0) ls else lineCursor
              lines += LineOut(lineNo, stripped, lStart, lStart + stripped.length)
              lineCursor = lStart + stripped.length
            }
          }
          Some(BlockOut(blockType, blockText, start, end, DirectConfidence, lines.toSeq))
        }
      }
      val stats = LangScript.pageStats(rawText)
      val lr = LangScript.detectLanguage(rawText, if (singlePage) tokens else null)
      PageOut(pi + 1, rawText, stats.charCount, stats.wordCount,
        stats.lineCount, stats.paragraphCount, lr.script, lr.detected,
        DirectConfidence, blocks)
    }

    val lower = fullText.toLowerCase

    // doc-level analysis (doc_analyzer suite, T4-T12) over the shared
    // token array
    val wc = TextAnalyzer.wordCloudFromTokens(tokens)
    val summary = TextAnalyzer.summarize(fullText, tokens)
    val docType = TextAnalyzer.classifyDocType(lower)
    val cats = TextAnalyzer.categories(lower)
    val kws = TextAnalyzer.keywordsFromTokens(tokens)
    val ents = TextAnalyzer.entities(fullText)

    // signature roll-up (E7/E8)
    val handwritten = sigPatterns.exists(lower.contains)
    val digital = signatures.nonEmpty
    val sigStatus =
      if (digital && handwritten) "both"
      else if (digital) "digitally_signed"
      else if (handwritten) "manually_signed"
      else "unsigned"

    // language roll-up: char-weighted argmax (T18, ocr_engine.py:1634-1639)
    val langWeights = pages.groupBy(_.language).view
      .mapValues(_.map(_.charCount.toLong).sum).toSeq
    val detectedLang =
      if (langWeights.isEmpty) "unknown"
      else langWeights.sortBy { case (l, w) => (-w, l) }.head._1

    val avgConf = if (pages.isEmpty) 0.0
      else pages.map(_.confidence).sum / pages.length
    val (clarityV, sourceV) = LangScript.clarity(avgConf)

    DocResult(
      url = url, warcTs = warcTs, lang = langHint, format = format,
      sha256 = hash, sizeBytes = size, status = "ok", error = "",
      title = title, pageCount = pages.length, fullText = fullText,
      pages = pages, signatures = signatures, signatureStatus = sigStatus,
      docType = docType, categories = cats, keywords = kws, entities = ents,
      topWords = wc.topWords.map(e => WordCloudOut(e.word, e.count, e.percentage)),
      summaryBrief = summary.brief, summaryDetailed = summary.detailed,
      keyPoints = summary.keyPoints,
      detectedLanguage = detectedLang,
      script = LangScript.detectScript(fullText),
      totalChars = pages.map(_.charCount.toLong).sum,
      totalWords = pages.map(_.wordCount.toLong).sum,
      avgConfidence = avgConf,
      confidenceLevel = LangScript.confidenceLevel(avgConf),
      clarity = clarityV, sourceType = sourceV,
      schemaVersion = "2.1",
      tables = tables)
  }

  private def emptyResult(url: String, warcTs: Timestamp, langHint: String,
      format: String, hash: String, size: Long): DocResult =
    DocResult(url, warcTs, langHint, format, hash, size, "empty", "",
      "", 0, "", Nil, Nil, "unsigned", "other", Nil, Nil, Nil, Nil,
      "Document vide ou illisible.",
      "Le document ne contient pas de texte exploitable.",
      Nil, "unknown", "unknown", 0L, 0L, 0.0, "uncertain", "poor", "ocr", "2.1")

  private def errorResult(url: String, warcTs: Timestamp, langHint: String,
      format: String, hash: String, size: Long, err: String): DocResult =
    DocResult(url, warcTs, langHint, format, hash, size, "error", err,
      "", 0, "", Nil, Nil, "unsigned", "other", Nil, Nil, Nil, Nil,
      "", "", Nil, "unknown", "unknown", 0L, 0L, 0.0, "uncertain", "poor", "ocr", "2.1")
}
