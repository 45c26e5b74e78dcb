package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Readability scoring — Flesch reading ease (Flesch 1948) and
  * Flesch-Kincaid grade level (Kincaid et al. 1975), the classic
  * document-quality signals educational-quality corpus filters rank
  * by. Both formulas are public domain; the constants are the
  * published ones (206.835 / 1.015 / 84.6 and 0.39 / 11.8 / 15.59).
  *
  * Everything is INTEGER-EXACT in milli-units so scores are
  * partitioning/summation-order/engine-independent:
  *   flesch_milli = 206835 − (1015·W) div S − (84600·Y) div W
  *   fk_milli     = (390·W) div S + (11800·Y) div W − 15590
  * with W = words, S = max(1, sentences), Y = syllables; W = 0 → NULL.
  *
  * Pinned counting heuristics (a deliberate, documented simplification
  * of dictionary syllabification — the formulas are heuristics
  * themselves):
  *   - words      = maximal `[A-Za-z]+` runs;
  *   - sentences  = `[.!?]+` runs, floored at 1;
  *   - syllables  = vowel groups `(?i)[aeiouy]+` (every vowel sits in
  *     a letter run, so this only counts inside words) PLUS one per
  *     all-consonant word (`(?i)\b[b-df-hj-np-tv-xz]+\b`) — the
  *     "every word has ≥1 syllable" floor; no silent-e subtraction.
  *
  * Scale shape: pure codegen column expressions (`regexp_count`,
  * integer arithmetic) — no UDF, no typed map, no shuffle; rides the
  * corpus scan inside WholeStageCodegen.
  */
object Readability {

  private def counts(textCol: Column): (Column, Column, Column) = {
    val w = regexp_count(textCol, lit("[A-Za-z]+")).cast("long")
    val s = greatest(regexp_count(textCol, lit("[.!?]+")), lit(1))
      .cast("long")
    val y = (regexp_count(textCol, lit("(?i)[aeiouy]+")) +
      regexp_count(textCol, lit("(?i)\\b[b-df-hj-np-tv-xz]+\\b")))
      .cast("long")
    (w, s, y)
  }

  /** Adds n_words / n_sentences / n_syllables / flesch_milli /
    * fk_milli columns. */
  def withReadability(df: DataFrame, textCol: String): DataFrame = {
    val (w, s, y) = counts(col(textCol))
    df.withColumn("n_words", w)
      .withColumn("n_sentences", s)
      .withColumn("n_syllables", y)
      .withColumn("flesch_milli",
        when(col("n_words") === 0, lit(null).cast("long"))
          .otherwise(lit(206835L) -
            expr("(1015 * n_words) div n_sentences") -
            expr("(84600 * n_syllables) div n_words")))
      .withColumn("fk_milli",
        when(col("n_words") === 0, lit(null).cast("long"))
          .otherwise(expr("(390 * n_words) div n_sentences") +
            expr("(11800 * n_syllables) div n_words") - lit(15590L)))
  }
}
