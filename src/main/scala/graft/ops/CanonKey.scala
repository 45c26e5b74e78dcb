package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical text key for exact dedup — the normalization pass that
  * makes cosmetically-different copies of one document share a dedup
  * key (case, punctuation drift, whitespace reflow, and Unicode
  * composition differences otherwise each defeat a raw-byte digest;
  * CCNet/Gopher-style pipelines normalize before hashing for exactly
  * this reason).
  *
  * Pinned pipeline, engine-reimplementable end to end:
  *   1. lowercase;
  *   2. Unicode NFC via the repo's native `graft_nfc` expression
  *      (decomposed `é` and precomposed `é` unify);
  *   3. every run of non-letter/non-digit chars (`[^\p{L}\p{N}]+`,
  *      Unicode classes) becomes ONE space — punctuation dies,
  *      whitespace collapses in the same step;
  *   4. trim.
  * The md5 of the key is the dedup digest (hex, lowercase — identical
  * in both engines).
  *
  * Pure codegen: lower / regexp_replace / trim plus the native NFC
  * expression — no UDF, rides the scan.
  */
object CanonKey {

  def canonKey(text: Column): Column =
    trim(regexp_replace(
      call_function("graft_nfc", lower(text)),
      "[^\\p{L}\\p{N}]+", " "))

  /** Adds canon_key + canon_digest columns (registers the native NFC
    * function on the session). */
  def withCanonKey(df: DataFrame, textCol: String): DataFrame = {
    graft.functions.GraftExtensions.register(df.sparkSession)
    df.withColumn("canon_key", canonKey(col(textCol)))
      .withColumn("canon_digest", md5(col("canon_key")))
  }
}
