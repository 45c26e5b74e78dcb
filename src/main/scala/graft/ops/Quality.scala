package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality operators for training-data curation: token counting,
  * quality scoring (length / punctuation / stopword ratios), language-ID,
  * and document fingerprinting (rolling hash). Column-expression forms
  * (codegen'd) where expressible; typed map otherwise. */
object Quality {

  /** Whitespace token count as a Column (codegen'd). */
  def tokenCountCol(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword token estimate: word chars split into runs of
    * letters / digits / single punctuation, ~GPT-2 pre-tokenizer shape. */
  def subwordCountCol(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  private val punctClass = "[.,!?;:]"

  /** Punctuation chars / total chars. */
  def punctRatioCol(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, punctClass, ""))).cast("double")
          / length(text))

  /** Mean token length (chars of non-space text / token count). */
  def meanTokenLenCol(text: Column): Column = {
    val tokens = tokenCountCol(text)
    when(tokens === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / tokens)
  }

  /** English stopword-token ratio (quality signal: natural prose has
    * 0.2–0.6; keyword-stuffed or non-linguistic text scores near 0). */
  def stopwordRatio(text: String): Double = {
    val toks = graft.analyzers.PyText.splitWs(
      if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT))
    if (toks.isEmpty) 0.0
    else toks.count(graft.analyzers.TextAnalyzer.stopwordsEn.contains).toDouble / toks.length
  }

  /** Composite quality score in [0,1] — deterministic heuristic:
    * length band + stopword ratio band + mean-word-length band +
    * punctuation sanity. Mirrors C4/Gopher-style filters (public). */
  def qualityScore(text: String): Double =
    qualityScoreWith(text, stopwordRatio(text))

  /** qualityScore with the stopword ratio precomputed (fused-UDF path). */
  private def qualityScoreWith(text: String, swr: Double): Double = {
    if (text == null || text.isEmpty) return 0.0
    val toks = graft.analyzers.PyText.splitWs(text)
    val n = toks.length
    var score = 0.0
    // length band
    if (n >= 50 && n <= 100000) score += 0.25
    else if (n >= 10) score += 0.1
    // mean word length 3..10
    val mwl = if (n == 0) 0.0 else toks.map(_.length).sum.toDouble / n
    if (mwl >= 3.0 && mwl <= 10.0) score += 0.25
    // stopword ratio
    if (swr >= 0.15 && swr <= 0.6) score += 0.25
    else if (swr > 0.05) score += 0.1
    // terminal punctuation on at least some lines
    val lines = graft.analyzers.PyText.splitKeepEmpty(text, "\n")
      .map(graft.analyzers.PyText.strip).filter(_.nonEmpty)
    if (lines.nonEmpty) {
      val punctLines = lines.count(l => ".!?\"'".contains(l.last))
      if (punctLines.toDouble / lines.length >= 0.3) score += 0.25
    }
    math.min(1.0, score)
  }

  /** 64-bit rolling-hash fingerprint of the whitespace-normalized text
    * (polynomial rolling hash, base 1000003). Identical after whitespace
    * jitter — cheaper than MinHash when only exact-after-normalize
    * dedup is needed. */
  def fingerprint64(text: String): Long = {
    if (text == null) return 0L
    fingerprintOfLower(text.toLowerCase(java.util.Locale.ROOT))
  }

  private def fingerprintOfLower(lower: String): Long = {
    val norm = graft.html.Boilerplate.normalizeWs(lower)
    var h = 1125899906842597L
    var i = 0
    while (i < norm.length) {
      h = h * 1000003L + norm.charAt(i)
      i += 1
    }
    h
  }

  final case class QualityStruct(stopword_ratio: Double, quality_score: Double,
      fingerprint: Long, detected_lang: String)

  /** The scalar-function quartet fused into ONE UDF invocation, sharing
    * one lowercase pass and one lowered-token split across the stopword
    * ratio, the quality score's stopword band, and the fingerprint
    * (language-ID keeps its own n-gram scan) — the column-expression
    * metrics stay codegen'd. */
  def qualityStruct(text: String): QualityStruct = {
    val t = if (text == null) "" else text
    val lower = t.toLowerCase(java.util.Locale.ROOT)
    val lowerToks = graft.analyzers.PyText.splitWs(lower)
    val swr =
      if (lowerToks.isEmpty) 0.0
      else lowerToks.count(graft.analyzers.TextAnalyzer.stopwordsEn.contains)
        .toDouble / lowerToks.length
    QualityStruct(
      swr,
      qualityScoreWith(t, swr),
      fingerprintOfLower(lower),
      graft.analyzers.LangScript.detectLanguage(t).detected)
  }

  /** Gopher-style repetition/shape filter signals (Rae et al. 2021,
    * "Scaling Language Models: Methods, Analysis & Insights from
    * Training Gopher", appendix A1 — public filter rules) as PURE column
    * expressions: whole-stage codegen, no UDF, and therefore exactly
    * DuckDB-twinnable (`quality_gopher` oracle). Signals:
    * word count / mean word length bands, duplicate-line fraction
    * (repetition), terminal-punctuation line fraction (C4 rule),
    * symbol-to-word ratio (# and ellipsis), and the resulting keep flag.
    * At 100 TB this is one narrow projection over the text column —
    * the cheap first pass every curation pipeline runs before dedup. */
  def withGopherColumns(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = textCol
    df
      .withColumn("n_words",
        expr(s"size(filter(split($t, '\\\\s+', -1), w -> w != ''))"))
      .withColumn("mean_word_len",
        expr(s"CASE WHEN n_words = 0 THEN CAST(0.0 AS DOUBLE) ELSE " +
          s"CAST(length(regexp_replace($t, '\\\\s', '')) AS DOUBLE) / n_words END"))
      .withColumn("__lines",
        expr(s"filter(transform(split($t, '\\n', -1), l -> trim(l)), l -> l != '')"))
      .withColumn("n_lines", expr("size(__lines)"))
      .withColumn("frac_distinct_lines",
        expr("CASE WHEN n_lines = 0 THEN CAST(1.0 AS DOUBLE) ELSE " +
          "CAST(size(array_distinct(__lines)) AS DOUBLE) / n_lines END"))
      .withColumn("frac_punct_lines",
        expr("""CASE WHEN n_lines = 0 THEN CAST(0.0 AS DOUBLE) ELSE
          CAST(size(filter(__lines, l -> l rlike '[.!?"]$')) AS DOUBLE) / n_lines END"""))
      .withColumn("symbol_word_ratio",
        expr(s"CASE WHEN n_words = 0 THEN CAST(0.0 AS DOUBLE) ELSE " +
          s"CAST((length($t) - length(replace($t, '#', ''))) + " +
          s"(length($t) - length(replace($t, '...', ''))) / 3 AS DOUBLE) / n_words END"))
      .withColumn("gopher_keep",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
        col("frac_distinct_lines") >= 0.7 &&
        col("symbol_word_ratio") <= 0.1)
      .drop("__lines")
  }

  /** DataFrame transform: append quality columns to a documents table. */
  def withQualityColumns(df: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qUdf = udf(qualityStruct _)
    df.withColumn("n_tokens", tokenCountCol(col(textCol)))
      .withColumn("n_subwords", subwordCountCol(col(textCol)))
      .withColumn("punct_ratio", punctRatioCol(col(textCol)))
      .withColumn("mean_token_len", meanTokenLenCol(col(textCol)))
      .withColumn("__q", qUdf(col(textCol)))
      .withColumn("stopword_ratio", col("__q.stopword_ratio"))
      .withColumn("quality_score", col("__q.quality_score"))
      .withColumn("fingerprint", col("__q.fingerprint"))
      .withColumn("detected_lang", col("__q.detected_lang"))
      .drop("__q")
  }
}
