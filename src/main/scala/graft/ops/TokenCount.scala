package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-token budget estimation — the question every pretraining
  * data plan starts with ("how many tokens does this corpus hold per
  * language?") answered without running a real tokenizer: a GPT-2-style
  * pre-tokenizer regex (Radford et al. 2019 — contractions, letter
  * runs, digit runs, punctuation runs, each with an optional leading
  * space) counts the units BPE would then sub-split, a stable upper
  * bound proxy that tracks real token counts closely on prose.
  *
  * Engine parity: the pattern stays inside the RE2-compatible subset
  * (no lookahead — the real GPT-2 pattern's `\s+(?!\S)` branch is
  * dropped; whitespace is simply never counted) and whitespace is the
  * EXPLICIT class [ \t\n\r] rather than `\s` (Java's `\s` includes
  * \x0B, RE2's does not), so Spark's java.util.regex and a DuckDB/RE2
  * oracle count identically on every input.
  *
  * Scale shape: both counters are `regexp_count` column expressions —
  * codegen, map-only, they ride the scan; the per-language roll-up
  * ships only (lang, sums).
  */
object TokenCount {

  /** GPT-2 pre-tokenizer, RE2-safe subset: contraction suffixes,
    * ` ?`letters+, ` ?`digits+, ` ?`other-runs. Whitespace runs are
    * skipped, not counted. */
  val BpePreTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\r\\p{L}\\p{N}]+"

  /** Whitespace-delimited word count (the cheap lower-bound proxy). */
  val WsTokenPattern: String = "[^ \\t\\n\\r]+"

  def bpeTokens(textCol: Column): Column =
    regexp_count(textCol, lit(BpePreTokenPattern)).cast("long")

  def wsTokens(textCol: Column): Column =
    regexp_count(textCol, lit(WsTokenPattern)).cast("long")

  /** Adds `bpe_tokens`, `ws_tokens`, `n_chars` per row. */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("bpe_tokens", bpeTokens(col(textCol)))
      .withColumn("ws_tokens", wsTokens(col(textCol)))
      .withColumn("n_chars", length(col(textCol)).cast("long"))

  /** Per-group token budget: doc count, token/char sums, and the
    * corpus-planning ratio bpe-tokens-per-1k-chars (integer, exact). */
  def tokenBudget(df: DataFrame, textCol: String,
                  groupCol: String): DataFrame =
    withTokenCounts(df, textCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bpe_tokens")).as("bpe_tokens"),
        sum(col("ws_tokens")).as("ws_tokens"),
        sum(col("n_chars")).as("sum_chars"))
      .withColumn("bpe_per_kchar",
        expr("(bpe_tokens * 1000) div sum_chars"))
}
