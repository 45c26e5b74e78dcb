package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter seen-set — the membership structure a
  * crawl frontier consults before scheduling a fetch ("have we ever
  * seen this URL?"). At 100 TB the seen-set is billions of URLs; the
  * filter compresses it to m bits with zero false negatives and a
  * tunable false-positive rate, and the BITMAP (m/64 rows of
  * (word, bits)) is what ships to executors — broadcastable at any
  * realistic m, while the raw URL set never moves again.
  *
  * Hashing is Kirsch–Mitzenmacher double hashing (two base hashes
  * derive all k probe positions: pos_i = (h1 + i·h2) mod m) over a
  * LONG key column in overflow-safe modular arithmetic — pure integer
  * column expressions, whole-stage codegen, engine-reproducible (the
  * DuckDB twin recomputes the identical bits). Callers feed an
  * already-hashed key (e.g. xxhash64 of the canonical URL); keys must
  * stay below ~2^43 for the multiply to avoid Long overflow — hash
  * then mask, or pass ids.
  *
  * Build: key → k positions → (word = pos/64, mask = 1<<(pos%64)) →
  * groupBy(word).bit_or(mask): one shuffle of at most m/64 groups.
  * Probe: candidate → k (word, mask) rows, broadcast-join the bitmap,
  * AND the k hit bits per key — a false negative is impossible by
  * construction (every set bit survives bit_or), which the oracle
  * certifies by the absence of the (truly_seen=true, maybe_seen=false)
  * cell.
  */
object Bloom {

  private val C1 = 2654435761L // Knuth multiplicative constant
  private val C2 = 40503L

  /** k probe positions for a long key column, as (word, mask) rows
    * appended to `df`. */
  private def probeRows(df: DataFrame, keyCol: String, mBits: Int,
                        k: Int): DataFrame = {
    val key = col(keyCol).cast("long")
    val h1 = pmod(key * lit(C1), lit(mBits.toLong))
    val h2 = pmod(key * lit(C2), lit(mBits.toLong - 1L)) + lit(1L)
    val positions = array((0 until k).map(i =>
      pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))): _*)
    df.withColumn("_pos", explode(positions))
      .withColumn("_word", expr("_pos div 64"))
      .withColumn("_mask", expr("shiftleft(1L, cast(_pos % 64 as int))"))
      .drop("_pos")
  }

  /** Seen keys → bitmap table (word BIGINT, bits BIGINT), at most
    * mBits/64 rows. */
  def build(seen: DataFrame, keyCol: String, mBits: Int,
            k: Int): DataFrame =
    probeRows(seen.select(col(keyCol)), keyCol, mBits, k)
      .groupBy(col("_word").as("word"))
      .agg(expr("bit_or(_mask)").as("bits"))

  /** Candidates × bitmap → (key, maybe_seen). Missing word rows read
    * as unset bits. */
  def probe(candidates: DataFrame, bitmap: DataFrame, keyCol: String,
            mBits: Int, k: Int): DataFrame = {
    probeRows(candidates.select(col(keyCol)), keyCol, mBits, k)
      .join(broadcast(bitmap), col("_word") === bitmap("word"), "left")
      .withColumn("_hit",
        coalesce((col("bits").bitwiseAND(col("_mask"))) === col("_mask"),
          lit(false)))
      .groupBy(col(keyCol))
      .agg(min(col("_hit")).as("maybe_seen"))
  }
}
