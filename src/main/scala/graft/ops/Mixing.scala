package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-scaled data-mixing quotas — the multilingual /
  * multi-domain rebalancing rule (Conneau & Lample 2019 §3.1; also
  * GPT-3's dataset weighting): sampling weight ∝ count^α with α < 1
  * upweights low-resource groups relative to their raw share, and a
  * document budget splits across groups by those weights.
  *
  * Scale shape: one map-side-combined count per group (shuffle rows
  * are (group, count) — group-bounded, tiny), then a broadcast 1-row
  * total; nothing at corpus cardinality moves. The output quota table
  * is the input to a deterministic keep-filter (Splits.stratifiedKeep)
  * applied map-only on the corpus.
  *
  * Determinism: each group's count^α quantizes to integer micro-units
  * FIRST (for the default α=0.5 via IEEE sqrt — exactly rounded, so
  * engine-identical), the normalizer is the INTEGER sum of those
  * (summation-order-free), and weights/quotas are integer divisions —
  * byte-reproducible across engines/partitionings. For α ≠ 0.5 the
  * scaling goes through pow(), whose last ulp is libm-dependent: same
  * semantics, but only the sqrt path is oracle-checked byte-exact.
  */
object Mixing {

  /** Per-group (n_docs, weight_micro, quota_docs) for a total doc
    * `budget`, weight ∝ n_docs^(alphaPct/100). */
  def temperatureQuotas(df: DataFrame, groupCol: String, budget: Long,
                        alphaPct: Int = 50): DataFrame = {
    require(alphaPct > 0 && alphaPct <= 100, "alphaPct in (0, 100]")
    require(budget >= 0, "budget must be non-negative")
    val scaled =
      if (alphaPct == 50) sqrt(col("n_docs").cast("double"))
      else pow(col("n_docs").cast("double"), alphaPct / 100.0)
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("s_micro", floor(scaled * lit(1e6)).cast("long"))
    val total = counts.agg(sum(col("s_micro")).as("total_micro"))
    counts.crossJoin(broadcast(total))
      .select(col(groupCol), col("n_docs"),
        expr("(s_micro * 1000000) div total_micro").as("weight_micro"),
        expr(s"($budget * s_micro) div total_micro").as("quota_docs"))
  }
}
