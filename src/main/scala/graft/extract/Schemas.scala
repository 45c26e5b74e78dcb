package graft.extract

import java.sql.Timestamp

/** Output data model of the extraction engine — the Spark re-expression of
  * the reference's OCRIntermediateResult + EnhancedJSONOutput v2.1 trees
  * (`idp_pipeline/config/intermediate_format.py:177-306,507-605`,
  * `models/ocr_engine.py:1544-1596,1783-1949`): nested
  * ArrayType(StructType) columns via case-class Encoders so Catalyst can
  * prune at every level (SURVEY.md §1.1, §1.3). Character spans
  * (start/end into fullText) are the north-rule addition.
  *
  * Every text byte is stored EXACTLY ONCE, in `fullText`; pages, blocks
  * and lines carry only [start, end) spans into it, so page/block/line
  * text is `fullText.substring(start, end)` (the views slice lazily).
  * Round 2 stored the text ~4× (page rawText + block text + line text on
  * top of fullText), which made the 32-thread extraction leg
  * DRAM-bandwidth-bound — at cluster scale the same duplication is 4×
  * the shuffle/serializer volume. */
final case class LineOut(
    lineNumber: Int,   // 1-based, per reference E1 (ocr_engine.py:1064-1078)
    start: Int,        // char offset into fullText (span)
    end: Int)

final case class BlockOut(
    blockType: String, // paragraph | heading | list_item | table_cell
    start: Int,        // char offset into fullText (span)
    end: Int,
    confidence: Double,
    lines: Seq[LineOut])

final case class PageOut(
    pageNumber: Int,   // 1-based
    start: Int,        // page slice of fullText: [start, end) — pages join
    end: Int,          // with PageBreak, so slices reconstruct fullText
    charCount: Int,
    wordCount: Int,
    lineCount: Int,
    paragraphCount: Int,
    script: String,
    language: String,
    confidence: Double,
    blocks: Seq[BlockOut],
    // R1 per-page structure analysis (`ocr_engine.py:875-1025`):
    // digital_text | scanned_image | mixed_content | image_with_text | empty
    pageType: String = "digital_text",
    extractionMethod: String = "direct", // direct | ocr | hybrid | skip
    imageCount: Int = 0)

final case class SignatureOut(fieldName: String, signed: Boolean)

/** Enhanced table (SURVEY.md §2.5 V1–V6): detected matrix + header
  * detection + financial flags + the three reconstruction renders
  * (HTML / Markdown / Python-csv.writer-parity CSV). */
final case class TableOut(
    tableId: String,
    page: Int,
    rows: Int,
    cols: Int,
    hasHeader: Boolean,
    headers: Seq[String],
    data: Seq[Seq[String]],
    isFinancial: Boolean,
    hasTotalRow: Boolean,
    html: String,
    markdown: String,
    csv: String)

final case class WordCloudOut(word: String, count: Int, percentage: Double)

final case class DocResult(
    url: String,
    warcTs: Timestamp,
    lang: String,              // input hint column, carried through
    format: String,            // html | pdf | empty | unknown
    sha256: String,
    sizeBytes: Long,
    status: String,            // ok | empty | error
    error: String,
    title: String,
    pageCount: Int,
    fullText: String,          // pages joined "\n\n--- PAGE BREAK ---\n\n" (E4)
    pages: Seq[PageOut],
    signatures: Seq[SignatureOut],
    signatureStatus: String,   // both|digitally_signed|manually_signed|unsigned (E8)
    docType: String,
    categories: Seq[String],
    keywords: Seq[String],
    entities: Seq[String],
    topWords: Seq[WordCloudOut],
    summaryBrief: String,
    summaryDetailed: String,
    keyPoints: Seq[String],
    detectedLanguage: String,  // char-weighted roll-up (T18)
    script: String,
    totalChars: Long,
    totalWords: Long,
    avgConfidence: Double,
    confidenceLevel: String,   // certain|high|medium|low|uncertain (T16)
    clarity: String,           // excellent|good|fair|poor (T17)
    sourceType: String,        // digital|ocr|hybrid (T17)
    schemaVersion: String,     // "2.1" (intermediate_format.py:539 + upgrade)
    tables: Seq[TableOut] = Nil, // enhanced tables (§2.5 V1-V6, E9)
    // R2 document-type roll-up (`ocr_engine.py:993-1023`):
    // pure_digital | pure_scanned | mixed
    documentStructure: String = "pure_digital",
    recommendedStrategy: String = "direct_extraction", // | full_ocr | hybrid_extraction
    // reference's per-strategy wall-time estimate (0.05 s/page digital,
    // 10 s/page OCR, 12 s/page hybrid — `ocr_engine.py:1001-1016`)
    estimatedTimeSec: Double = 0.0,
    // R4 additive complexity 0-100 (`smart_router.py:218-242`)
    complexityScore: Int = 50)
