package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-balanced output-shard assignment — writing a curated corpus as
  * uniform training shards needs each document's GLOBAL running byte
  * offset, and the naive `sum().over(orderBy(id))` window moves the
  * whole corpus to ONE task. This is the scalable alternative: a
  * two-level (distributed) prefix sum.
  *
  *   1. bucket = id div bucketSize; per-bucket byte totals roll up
  *      with one partial-aggregated shuffle of N/bucketSize rows.
  *   2. Bucket BASE offsets = exclusive cumsum over the tiny bucket
  *      table (the only single-partition window, over N/bucketSize
  *      rows — thousands, not billions).
  *   3. Bases broadcast-join back; the within-bucket cumsum windows
  *      over at most bucketSize rows per bucket, fully parallel.
  *
  * A document is assigned to the shard its FIRST byte falls in:
  * shard = start_offset div targetBytes — deterministic, order-stable
  * (by id), and every shard's size is < targetBytes + max doc size
  * (the boundary document overhang), which is the accepted balance
  * contract for training-shard writers.
  */
object Shards {

  /** (id, bytes) → (id, bytes, start_off, shard). */
  def assign(df: DataFrame, idCol: String, bytesCol: String,
             targetBytes: Long, bucketSize: Long = 1 << 16): DataFrame = {
    val id = col(idCol).cast("long")
    val d = df.select(id.as("_id"),
      col(bytesCol).cast("long").as("_bytes"))
      .withColumn("_bucket", expr(s"_id div $bucketSize"))
    val bucketTotals = d.groupBy(col("_bucket"))
      .agg(sum(col("_bytes")).as("_btot"))
    // exclusive cumsum over the bucket table: tiny by construction
    val baseW = Window.orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = bucketTotals
      .withColumn("_base", sum(col("_btot")).over(baseW) - col("_btot"))
      .select(col("_bucket"), col("_base"))
    val localW = Window.partitionBy(col("_bucket")).orderBy(col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(bases), "_bucket")
      .withColumn("_cum", sum(col("_bytes")).over(localW) + col("_base"))
      .select(col("_id").as(idCol), col("_bytes").as("bytes"),
        (col("_cum") - col("_bytes")).as("start_off"),
        expr(s"(_cum - _bytes) div $targetBytes").as("shard"))
  }

  /** Per-shard envelope: doc count, bytes, id span — the report a
    * shard writer logs per output file. */
  def shardStats(assigned: DataFrame, idCol: String): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bytes")).cast("long").as("shard_bytes"),
        min(col(idCol)).as("first_id"),
        max(col(idCol)).as("last_id"))
      .orderBy(col("shard"))
}
