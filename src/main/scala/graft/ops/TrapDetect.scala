package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-trap detection — the frontier guard every production crawler
  * runs (Heritrix ships the same rule family): URL spaces that grow
  * without bound (calendar pages, session ids, self-linking galleries)
  * must be cut BEFORE fetch, or the politeness-limited crawl budget of
  * a host drowns in trap pages.
  *
  * FIRST-FAILING rule order (same auditability convention as
  * `UrlFilter`'s drop reasons):
  *   1. `repeat_segment` — some path segment occurs ≥ 3 times
  *      (gallery/self-link loops like /a/b/a/c/a);
  *   2. `depth` — more than 12 path segments;
  *   3. `query_blowup` — more than 8 query parameters;
  *   4. `session_id` — a parameter value containing a 32+ char hex
  *      run (session/tracking tokens make every visit a "new" URL);
  *   5. `calendar` — a /YYYY/ path year outside [1995, 2030]
  *      (infinite calendar paging);
  *   6. `ok`.
  *
  * Everything is higher-order-function column expressions (exists /
  * filter / array ops + RE2-safe regexes) — no UDF, rides the
  * frontier scan; the whole check costs less than the DNS lookup it
  * saves.
  */
object TrapDetect {

  /** Adds a `trap_reason` column from path + query columns. */
  def withTrapReason(df: DataFrame, pathCol: String,
                     queryCol: String): DataFrame = {
    val segs = expr(
      s"filter(split($pathCol, '/'), x -> x != '')")
    val params = expr(
      s"filter(split($queryCol, '&'), x -> x != '')")
    val d = df.withColumn("_segs", segs).withColumn("_params", params)
    val repeatSeg = expr(
      "exists(array_distinct(_segs), " +
        "d -> size(filter(_segs, x -> x = d)) >= 3)")
    val tooDeep = size(col("_segs")) > 12
    val blowup = size(col("_params")) > 8
    val sessionId = expr(
      "exists(_params, p -> p rlike '=[0-9a-f]{32}')")
    val yearStr = regexp_extract(col(pathCol),
      "/((?:19|20)[0-9]{2})(?:/|$)", 1)
    val calendar = yearStr =!= "" &&
      (yearStr.cast("int") < 1995 || yearStr.cast("int") > 2030)
    d.withColumn("trap_reason",
        when(repeatSeg, "repeat_segment")
          .when(tooDeep, "depth")
          .when(blowup, "query_blowup")
          .when(sessionId, "session_id")
          .when(calendar, "calendar")
          .otherwise("ok"))
      .drop("_segs", "_params")
  }
}
