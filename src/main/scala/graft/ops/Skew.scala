package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for keyed aggregations (SURVEY.md §4.2): a hot key
  * (one domain holding 10% of 10^12 pages) lands its entire group on a
  * single reducer. Salting splits each group into `salt` sub-groups for
  * the partial aggregate, then combines the partials in a second, tiny
  * aggregate — the classic two-phase re-aggregation, expressed so both
  * phases stay in Catalyst's HashAggregate codegen.
  *
  * AQE's skew handling only splits *join* partitions; aggregation skew
  * needs this explicit transform. Correct only for algebraic aggregates
  * (sum/count/min/max — anything with a merge step); not for exact
  * count-distinct across salts (use approx or a two-level distinct). */
object Skew {

  /** Per-row deterministic salt in [0, salt) — NOT random: derived from
    * a second hash of the key plus a row-local discriminator column so
    * re-runs place rows identically (resume-safe, unlike rand()). */
  def saltCol(discriminator: Column, salt: Int): Column =
    pmod(hash(discriminator, lit(0x5bd1e995)), lit(salt))

  /** Salted count per key: phase 1 counts per (key, salt), phase 2 sums
    * the partials per key. */
  def saltedCount(df: DataFrame, keyCol: String, discriminatorCol: String,
      salt: Int = 16): DataFrame = {
    df.withColumn("__salt", saltCol(col(discriminatorCol), salt))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("cnt"))
  }

  /** Salted sum/count/min/max of a value column per key. */
  def saltedStats(df: DataFrame, keyCol: String, valueCol: String,
      discriminatorCol: String, salt: Int = 16): DataFrame = {
    df.withColumn("__salt", saltCol(col(discriminatorCol), salt))
      .groupBy(col(keyCol), col("__salt"))
      .agg(
        sum(col(valueCol)).as("__sum"),
        count(col(valueCol)).as("__cnt"),
        min(col(valueCol)).as("__min"),
        max(col(valueCol)).as("__max"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__sum")).as("total"),
        sum(col("__cnt")).as("cnt"),
        min(col("__min")).as("min"),
        max(col("__max")).as("max"))
  }
}
