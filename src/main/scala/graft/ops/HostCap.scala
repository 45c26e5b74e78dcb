package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-host document caps — domain rate limiting, the curation step
  * that stops a handful of mega-domains (forums, wikis, link farms)
  * from dominating a crawl-derived training set: keep at most k
  * documents per host, ranked by a caller-chosen quality order.
  *
  * Spark-first shape: a rank-then-filter window, deliberately written
  * as `row_number <= k` so Catalyst rewrites it into WindowGroupLimit
  * (Spark 3.5+): each map task pre-prunes to its local top-k PER HOST
  * before the shuffle, so a mega-host with 10^8 docs ships
  * k·numPartitions candidate rows, not 10^8 — the window equivalent of
  * a map-side combine. The caller's order must be total (end with a
  * unique id) or re-runs may keep different docs.
  */
object HostCap {

  /** Adds `host_rank` (1-based within host, by `order`) and keeps rows
    * ranked <= k. `order` must total-order rows within a host. */
  def capPerHost(df: DataFrame, hostCol: String, k: Int,
                 order: Column*): DataFrame = {
    require(order.nonEmpty, "capPerHost needs a total per-host ordering")
    val w = Window.partitionBy(col(hostCol)).orderBy(order: _*)
    df.withColumn("host_rank", row_number().over(w))
      .where(col("host_rank") <= k)
  }
}
