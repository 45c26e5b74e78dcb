package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — approximate
  * per-key frequencies for heavy-hitter detection when the key space
  * is too large to groupBy exactly. The sketch is d·w counters
  * (depth × width); an estimate is the MIN over the d hashed counters,
  * so it can only OVERestimate (never under), by at most the collision
  * mass ~N/w per row with probability 1 − 2^−d.
  *
  * Hashing is pairwise-independent modular: pos_r = ((key·A_r + B_r)
  * mod P) mod w with P = 2^31−1 prime and fixed odd constants — pure
  * integer column expressions, whole-stage codegen, engine-exact (the
  * DuckDB twin recomputes every counter).
  *
  * Scale shape: build explodes each row into d (row, idx) cells, but
  * partial aggregation collapses them map-side to at most d·w groups
  * per task — the shuffle is bounded by tasks·d·w counters no matter
  * how many events flow in, and the finished sketch (≤ d·w rows)
  * broadcasts to the probe side.
  */
object CountMin {

  private val P = 2147483647L // 2^31 - 1, prime
  private val A = Array(2654435761L, 40503L, 2246822519L, 3266489917L)
  private val B = Array(97L, 1013904223L, 374761393L, 668265263L)

  /** (row, idx) position expressions for one key column. */
  private def withCells(df: DataFrame, keyCol: String, depth: Int,
                        width: Int): DataFrame = {
    require(depth >= 1 && depth <= A.length, s"depth must be 1..${A.length}")
    val key = col(keyCol).cast("long")
    df.withColumn("_row", explode(array((0 until depth).map(lit): _*)))
      .withColumn("_idx",
        (0 until depth).foldLeft(lit(0L)) { (acc, r) =>
          when(col("_row") === r,
            pmod(pmod(key * lit(A(r)) + lit(B(r)), lit(P)),
              lit(width.toLong))).otherwise(acc)
        })
  }

  /** Stream of keys → sketch table (row, idx, cnt), at most depth·width
    * rows. */
  def build(df: DataFrame, keyCol: String, depth: Int,
            width: Int): DataFrame =
    withCells(df.select(col(keyCol)), keyCol, depth, width)
      .groupBy(col("_row").as("row"), col("_idx").as("idx"))
      .agg(count(lit(1)).as("cnt"))

  /** Probe keys × sketch → (key, est) where est = min over the d
    * counters. Absent cells read 0 (key never seen). */
  def estimate(probes: DataFrame, sketch: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame =
    withCells(probes.select(col(keyCol)), keyCol, depth, width)
      .join(broadcast(sketch),
        col("_row") === sketch("row") && col("_idx") === sketch("idx"),
        "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
