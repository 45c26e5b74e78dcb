package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-candidate mining — the inner step of byte-pair-encoding
  * vocabulary induction (Sennrich et al. 2016, "Neural machine
  * translation of rare words with subword units"): over a
  * frequency-weighted word vocabulary whose words end in the `</w>`
  * marker, count adjacent symbol pairs; the most frequent pair is the
  * next merge. This computes the first-round candidate table — the
  * expensive, corpus-sized step of a BPE trainer (later rounds run on
  * the vocab table alone).
  *
  * Scale shape: the corpus is touched ONCE (token explode → word-count
  * aggregate, map-side combined); the pair explosion runs on the
  * VOCAB table (vocabulary cardinality, not corpus cardinality), and
  * top-k plans as TakeOrderedAndProject. Everything is codegen column
  * expressions — regexp_extract_all / transform / explode(sequence) /
  * substring — no UDF, no typed map.
  *
  * Tokens: `[A-Za-z]+` runs lowered per-token (ASCII-only runs, so
  * folding is engine-independent — same pinned convention as
  * `Collocations`).
  */
object Bpe {

  /** Top-k merge candidates: (sym1, sym2, pair_count), ranked count
    * desc with a (sym1, sym2) tie-break. The end-of-word pair's sym2
    * is the literal `</w>`. */
  def mergeCandidates(df: DataFrame, textCol: String,
                      k: Int = 25): DataFrame = {
    val vocab = df
      .select(explode(expr(
        s"transform(regexp_extract_all($textCol, '[A-Za-z]+', 0), " +
          "t -> lower(t))")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    vocab
      .select(col("word"), col("freq"),
        explode(expr("sequence(1, length(word))")).as("i"))
      .select(
        expr("substring(word, i, 1)").as("sym1"),
        expr("CASE WHEN i < length(word) THEN substring(word, i + 1, 1) " +
          "ELSE '</w>' END").as("sym2"),
        col("freq"))
      .groupBy(col("sym1"), col("sym2"))
      .agg(sum(col("freq")).cast("long").as("pair_count"))
      .orderBy(col("pair_count").desc, col("sym1"), col("sym2"))
      .limit(k)
  }
}
