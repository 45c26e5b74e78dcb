package graft.analyzers

/** Script detection, language identification, per-page statistics and
  * confidence bucketing (SURVEY.md T13–T18).
  *
  * Script detection is an exact port of the char-range counter in
  * `idp_pipeline/models/ocr_engine.py:829-873`. Language identification
  * replaces the reference's langdetect call (`ocr_engine.py:777-827`,
  * seed=0) with a from-scratch stopword-profile Naive-Bayes-ish scorer
  * over frozen profiles — the fixture contract pins OUR profiles
  * (SURVEY.md §7.3 item 5); the input table's `lang` column remains the
  * authoritative hint.
  */
object LangScript {

  // ------------------------------------------------------ T14 script detect

  /** `_detect_script` (ocr_engine.py:829-873): count chars by unicode
    * range; dominant <50% → "Mixed"; no alphabetic chars → "unknown". */
  def detectScript(text: String): String = {
    if (text == null || text.isEmpty) return "unknown"
    var latin = 0L; var cyrillic = 0L; var arabic = 0L; var cjk = 0L; var other = 0L
    var i = 0
    while (i < text.length) {
      val code = text.codePointAt(i)
      if (code >= 0x0041 && code <= 0x024F) latin += 1
      else if (code >= 0x0400 && code <= 0x04FF) cyrillic += 1
      else if (code >= 0x0600 && code <= 0x06FF) arabic += 1
      else if ((code >= 0x4E00 && code <= 0x9FFF) ||
               (code >= 0x3040 && code <= 0x309F) ||
               (code >= 0x30A0 && code <= 0x30FF)) cjk += 1
      else if (Character.isLetter(code)) other += 1
      i += Character.charCount(code)
    }
    val total = latin + cyrillic + arabic + cjk + other
    if (total == 0) return "unknown"
    // Python max(counts, key=counts.get) — first max in insertion order:
    val ordered = Seq("Latin" -> latin, "Cyrillic" -> cyrillic,
      "Arabic" -> arabic, "CJK" -> cjk, "Other" -> other)
    val (dominant, count) = ordered.maxBy { case (_, c) => c } // maxBy keeps first max
    if (count.toDouble / total < 0.5) "Mixed" else dominant
  }

  // ---------------------------------------------------- T13 language detect

  /** Frozen per-language marker-word profiles (top function words). These
    * are OUR deterministic profiles, not langdetect's. */
  val profiles: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "for", "with",
      "are", "was", "this", "have", "from", "not", "they", "his", "her"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "est", "un", "une",
      "pour", "dans", "que", "qui", "sur", "avec", "pas", "sont", "nous"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "mit", "den",
      "nicht", "ein", "eine", "auf", "für", "sich", "dem", "des", "auch"),
    "es" -> Set("el", "la", "los", "las", "de", "que", "en", "un", "una",
      "por", "con", "para", "es", "del", "se", "no", "más", "como"),
    "it" -> Set("il", "la", "di", "che", "e", "un", "una", "per", "con",
      "del", "della", "non", "sono", "da", "si", "nel", "alla"),
    "pt" -> Set("o", "a", "os", "as", "de", "que", "em", "um", "uma",
      "para", "com", "não", "do", "da", "dos", "das", "mais"),
    "nl" -> Set("de", "het", "een", "van", "en", "is", "dat", "op", "te",
      "met", "voor", "niet", "zijn", "aan", "ook", "naar"))

  final case class LangResult(detected: String, confidence: Double,
      alternates: Seq[(String, Double)], script: String)

  /** Deterministic language-ID: score = matched marker-word tokens per
    * language / total tokens; <20 chars stripped → unknown (mirrors
    * `ocr_engine.py:788-795`); non-Latin scripts short-circuit on script. */
  def detectLanguage(text: String): LangResult = detectLanguage(text, null)

  /** Overload taking pre-computed tokens (must equal tokenize(text)) —
    * lets the extraction hot path share one tokenize pass for
    * single-page documents. */
  def detectLanguage(text: String, preTokens: Array[String]): LangResult = {
    if (text == null || PyText.strip(text).length < 20)
      return LangResult("unknown", 0.0, Nil, "unknown")
    val script = detectScript(text)
    script match {
      case "Cyrillic" => return LangResult("ru", 0.9, Nil, script)
      case "Arabic" => return LangResult("ar", 0.9, Nil, script)
      case "CJK" => return LangResult("zh", 0.9, Nil, script)
      case _ =>
    }
    val tokens = if (preTokens != null) preTokens else TextAnalyzer.tokenize(text)
    if (tokens.isEmpty) return LangResult("unknown", 0.0, Nil, script)
    val hits = profiles.map { case (lang, words) =>
      (lang, tokens.count(words.contains).toDouble)
    }
    val totalHits = hits.map(_._2).sum
    if (totalHits == 0) return LangResult("unknown", 0.0, Nil, script)
    val scored = hits.map { case (l, h) => (l, h / totalHits) }
      .sortBy { case (l, p) => (-p, l) }
    val primary = scored.head
    val alternates = scored.tail
      .filter(_._2 > 0.1)
      .map { case (l, p) => (l, PyText.pyRound(p, 3)) }
    LangResult(primary._1, PyText.pyRound(primary._2, 3), alternates, script)
  }

  // ------------------------------------------------------ T15 page stats

  final case class PageStats(charCount: Int, wordCount: Int, lineCount: Int,
      paragraphCount: Int)

  /** `ocr_engine.py:1624-1631`: char_count=len, word_count=len(split()),
    * line_count=len(split('\n')), paragraph_count=non-blank split('\n\n'). */
  def pageStats(text: String): PageStats = PageStats(
    text.length,
    PyText.splitWs(text).length,
    PyText.splitKeepEmpty(text, "\n").length,
    PyText.splitKeepEmpty(text, "\n\n").count(p => PyText.strip(p).nonEmpty))

  // ------------------------------------------ T16/T17 confidence semantics

  /** `intermediate_format.py:44-55` thresholds. */
  def confidenceLevel(conf: Double): String =
    if (conf >= 0.95) "certain"
    else if (conf >= 0.80) "high"
    else if (conf >= 0.60) "medium"
    else if (conf >= 0.40) "low"
    else "uncertain"

  /** `ocr_engine.py:1641-1657`: clarity + source type from confidence. */
  def clarity(conf: Double): (String, String) =
    if (conf >= 0.95) ("excellent", "digital")
    else if (conf >= 0.85) ("good", "ocr")
    else if (conf >= 0.70) ("fair", "hybrid")
    else ("poor", "ocr")
}
