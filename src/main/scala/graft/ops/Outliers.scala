package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-host robust outlier detection — median/MAD (median absolute
  * deviation, the standard robust scale estimator; Hampel 1974), the
  * anomaly signal that survives the exact pathology it hunts: a mean/
  * stddev rule is dragged by the very mega-documents and spam bursts
  * it should flag, the median/MAD rule is not (50% breakdown point).
  *
  * INTEGER-EXACT by construction: the median is the LOWER MEDIAN —
  * the sorted element at 1-based rank (n+1) div 2 — picked by
  * row_number, never interpolated, so every statistic stays int64 and
  * engine/partitioning-independent. The outlier gate is the classic
  * 3σ-equivalent |x − med| > 3 · 1.4826 · MAD, cross-multiplied to
  * integers: 10000·|x − med| > 44478·MAD.
  *
  * Scale shape: two window passes partitioned by host (the natural
  * shard key — partitions are host-bounded, not corpus-bounded) with
  * the host-cardinality median/MAD tables BROADCAST back between
  * them; the final roll-up reuses the same host partitioning. For
  * hosts so large a per-host sort is unacceptable, swap the exact
  * lower-median for percentile_approx — same plan shape, documented
  * tradeoff.
  */
object Outliers {

  /** Per-host (n_docs, med_v, mad_v, n_outliers) over an integer
    * value column. */
  def hostMadOutliers(df: DataFrame, idCol: String, hostCol: String,
                      valueCol: String): DataFrame = {
    val d = df.select(col(idCol).cast("long").as("_id"),
      col(hostCol).cast("string").as("host"),
      col(valueCol).cast("long").as("v"))
    def lowerMedian(in: DataFrame, vCol: String): DataFrame = {
      val w = Window.partitionBy(col("host"))
        .orderBy(col(vCol), col("_id"))
      val wn = Window.partitionBy(col("host"))
      in.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .where(col("rn") === expr("(n + 1) div 2"))
        .select(col("host"), col(vCol).as("_m"))
    }
    val med = lowerMedian(d, "v").withColumnRenamed("_m", "med_v")
    val withMed = d.join(broadcast(med), Seq("host"))
      .withColumn("av", abs(col("v") - col("med_v")))
    val mad = lowerMedian(withMed, "av").withColumnRenamed("_m", "mad_v")
    withMed.join(broadcast(mad), Seq("host"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        first(col("med_v")).as("med_v"),
        first(col("mad_v")).as("mad_v"),
        sum(when(lit(10000L) * col("av") > lit(44478L) * col("mad_v"),
          1L).otherwise(0L)).as("n_outliers"))
  }
}
