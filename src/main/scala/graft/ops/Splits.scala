package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and stratified sampling — the two
  * "which rows go where" decisions every training-data pipeline makes
  * after curation:
  *
  *   - train/val/test assignment that is STABLE across runs, cluster
  *     sizes, and partitionings (never `rand()`: a re-run must put the
  *     same document in the same split, or eval sets silently leak into
  *     training between pipeline versions);
  *   - per-group downsampling with exact, reproducible rates (e.g.
  *     rebalance an English-dominated crawl) where the keep decision is
  *     a pure function of the key, not of execution order.
  *
  * Both are built on the same primitive: a content-derived hash bucket
  * in [0, 256) computed with `md5` — chosen over xxhash/murmur because
  * MD5 is bit-identical across every engine (the DuckDB oracle twin
  * recomputes it independently), and at two hex chars per row the cost
  * is irrelevant next to the scan.
  *
  * Scale shape: both operators are map-only column expressions — no
  * shuffle, no UDF, fully inside whole-stage codegen; the per-group
  * roll-ups downstream are single map-side-combined hash aggregates.
  */
object Splits {

  /** Hash bucket in [0, 256): the first two hex chars of md5(key). */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("int")

  /** Split assignment from the bucket: train = [0,208) (81.25%),
    * val = [208,232) (9.375%), test = [232,256) (9.375%). */
  def assignSplit(key: Column): Column = {
    val b = hashBucket(key)
    when(b < 208, "train").when(b < 232, "val").otherwise("test")
  }

  /** Adds `bucket` and `split` columns keyed on `keyCol`. */
  def withSplit(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("bucket", hashBucket(col(keyCol)))
      .withColumn("split", assignSplit(col(keyCol)))

  /** Deterministic stratified keep-decision: keep a row iff its salted
    * bucket falls under the group's rate threshold (in 256ths). The
    * salt decorrelates sampling from split assignment — the same key
    * must be able to land in train AND be downsampled independently. */
  def stratifiedKeep(key: Column, threshold256: Column,
                     salt: String = "strat:"): Column =
    hashBucket(concat(lit(salt), key.cast("string"))) < threshold256
}
