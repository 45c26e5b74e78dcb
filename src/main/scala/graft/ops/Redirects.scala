package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Redirect-chain resolution by POINTER DOUBLING — the classic
  * parallel list-ranking trick (Wyllie 1979): each round joins the
  * pointer table with itself, so after r rounds every source sees the
  * node 2^r hops ahead (or its terminal, wherever reached first).
  * Chains up to 2^rounds resolve in `rounds` self-joins — log-depth,
  * where the naive walk would need one join PER HOP over the whole
  * table (64-hop chains: 6 joins instead of 64).
  *
  * Cycles (including self-loops) never reach a terminal; after the
  * doubling rounds any source whose pointer still has an out-edge is
  * reported `resolved = false` with NULL final/hops — the crawler's
  * signal to drop the redirect family as a trap.
  *
  * Scale shape: the edge table is redirect-cardinality (a small slice
  * of the corpus), persisted once; every round is one equi-join +
  * coalesce projection on it. Deterministic: hops accumulate exactly
  * the chain length for resolved sources.
  */
object Redirects {

  /** (src, final_dst, hops, resolved) for every redirect source.
    * Resolves chains up to 2^doublingRounds hops. */
  def resolve(edgesIn: DataFrame, doublingRounds: Int = 6): DataFrame = {
    require(doublingRounds >= 1 && doublingRounds <= 20)
    val edges = edgesIn.select(col("src").cast("string"),
        col("dst").cast("string"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var f = edges.withColumn("hops", lit(1L))
    for (_ <- 1 to doublingRounds) {
      val g = f.select(col("src").as("_gs"), col("dst").as("_gd"),
        col("hops").as("_gh"))
      f = f.join(g, col("dst") === col("_gs"), "left")
        .select(col("src"),
          coalesce(col("_gd"), col("dst")).as("dst"),
          (col("hops") + coalesce(col("_gh"), lit(0L))).as("hops"))
    }
    val outSrcs = edges.select(col("src").as("dst")).distinct()
      .withColumn("_has_out", lit(true))
    f.join(outSrcs, Seq("dst"), "left")
      .select(col("src"),
        when(col("_has_out").isNotNull, lit(null).cast("string"))
          .otherwise(col("dst")).as("final_dst"),
        when(col("_has_out").isNotNull, lit(null).cast("long"))
          .otherwise(col("hops")).as("hops"),
        col("_has_out").isNull.as("resolved"))
  }
}
