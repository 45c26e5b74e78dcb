package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles WITHOUT a corpus sort — the histogram
  * trick: integer measures (lengths, counts, sizes) have value
  * cardinality orders of magnitude below row cardinality, so
  * aggregate to a (value, count) histogram first (map-side combined,
  * one shuffle bounded by DISTINCT VALUES), run the cumulative sum
  * over that small table, and read each quantile off the cumulative
  * counts. percentile_approx trades error for memory; this trades
  * nothing when the value domain is bounded — and doc-length-style
  * domains always are (a length column over 10^12 docs still has only
  * ~10^6 distinct values).
  *
  * Pinned semantics: type-1 (lower) quantile — the smallest value v
  * whose cumulative count reaches rank ceil(p·n/100), integer-exact,
  * engine-independent (no interpolation ever).
  *
  * The cumulative window is global-ordered but runs on the HISTOGRAM,
  * not the corpus — bounded by value cardinality (documented
  * contract; for unbounded domains bucket first or use the two-level
  * prefix sum as in `Shards`).
  */
object Quantiles {

  /** One row: (n, p50, p90, p99) for an integer value column. */
  def exactQuantiles(df: DataFrame, valueCol: String): DataFrame = {
    val hist = df.select(col(valueCol).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v"))
    // the grand total rides the SAME window pass as the running sum
    // (unbounded frame) — one scan, one histogram shuffle, no second
    // derivation of the input
    val cum = hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
    cum
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= expr("(50 * n + 99) div 100"),
          col("v"))).as("p50"),
        min(when(col("cum") >= expr("(90 * n + 99) div 100"),
          col("v"))).as("p90"),
        min(when(col("cum") >= expr("(99 * n + 99) div 100"),
          col("v"))).as("p99"))
  }
}
