package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental snapshot delta — the primitive that keeps a 100 TB
  * pipeline from reprocessing the whole crawl every cycle: diff the new
  * snapshot against the previous one by key and content digest, then
  * run extraction/curation only over `added` + `changed` rows (and
  * retire `removed` ones from downstream indexes).
  *
  * Scale shape: ONE full-outer shuffle join on the key; each side
  * carries only (key, 32-byte digest) — document text never moves.
  * The classification is a pure column expression over the join result,
  * and the usual follow-up (`added`/`changed` keys back to the source)
  * is a broadcast-able or shuffle semi-join on the key.
  */
object Snapshot {

  /** Per-key delta between two snapshots, classified
    * added / removed / changed / unchanged by digest compare.
    * Inputs need (keyCol, digestCol); compute the digest in the scan
    * projection (e.g. sha2(text, 256)) so only narrow rows shuffle. */
  def delta(oldSnap: DataFrame, newSnap: DataFrame,
            keyCol: String, digestCol: String): DataFrame = {
    val o = oldSnap.select(col(keyCol), col(digestCol).as("old_digest"))
    val n = newSnap.select(col(keyCol), col(digestCol).as("new_digest"))
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("old_digest").isNull, "added")
          .when(col("new_digest").isNull, "removed")
          .when(col("old_digest") === col("new_digest"), "unchanged")
          .otherwise("changed"))
  }

  /** Roll-up of `delta`: per-status row count and key checksum (the
    * checksum certifies WHICH keys landed in each class, not just how
    * many). Expects a numeric key. */
  def deltaStats(oldSnap: DataFrame, newSnap: DataFrame,
                 keyCol: String, digestCol: String): DataFrame =
    delta(oldSnap, newSnap, keyCol, digestCol)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(keyCol)).cast("long").as("key_checksum"))
}
