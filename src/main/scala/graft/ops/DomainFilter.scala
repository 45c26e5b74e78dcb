package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-level filtering — derive a host blocklist from document-level
  * signals, then apply it (the FineWeb/RefinedWeb curation pattern:
  * spam concentrates by DOMAIN, so per-doc quality scores aggregate
  * into per-host decisions that filter whole domains at once).
  *
  * Scale shape: the stats pass is one map-side-combined hash aggregate
  * (shuffle rows are (host, count, sum) — domain-bounded, tiny); the
  * relative threshold joins as a broadcast 1-row cross join; applying
  * the blocklist is a BROADCAST LEFT ANTI join — the blocklist is
  * domain-cardinality (millions of rows at web scale, still megabytes),
  * so the 100 TB doc side never shuffles.
  */
object DomainFilter {

  /** Per-host doc count and exact quality sum/mean. The mean divides an
    * exact integer sum by an exact count — one IEEE division, engine-
    * deterministic (never a float running sum). */
  def hostStats(docs: DataFrame, hostCol: String,
                qualityCol: String): DataFrame =
    docs.groupBy(col(hostCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(qualityCol)).cast("long").as("sum_q"))
      .withColumn("mean_q", col("sum_q").cast("double") / col("n_docs"))

  /** Hosts whose mean quality falls strictly below the median of host
    * means — a relative threshold, so the rule adapts to the corpus
    * instead of hard-coding a score scale. */
  def deriveBlocklist(stats: DataFrame): DataFrame = {
    val med = stats.agg(
      expr("percentile(mean_q, 0.5)").as("median_mean"))
    stats.crossJoin(broadcast(med))
      .where(col("mean_q") < col("median_mean"))
      .select(col(stats.columns.head))
  }

  /** Drop every doc on a blocklisted host: broadcast left-anti join —
    * the corpus side stays shuffle-free. */
  def applyBlocklist(docs: DataFrame, blocklist: DataFrame,
                     hostCol: String): DataFrame =
    docs.join(broadcast(blocklist), Seq(hostCol), "left_anti")
}
