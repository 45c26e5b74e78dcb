package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window passage chunking — the segmentation step every
  * RAG / embedding / long-context training pipeline runs between
  * extraction and encoding: fixed token windows of `size` with
  * `overlap` tokens of context carried across boundaries.
  *
  * Pinned contract (engine-independent, all integer):
  *   - tokens are `\S+` runs (whitespace-delimited, no empties);
  *   - stride = size − overlap; chunk i covers tokens
  *     [i·stride, i·stride + size) (truncated at the end);
  *   - the last chunk is the smallest i whose window reaches the final
  *     token — a trailing window FULLY CONTAINED in its predecessor is
  *     never emitted (last index = ceil((n − size)/stride), 0 when
  *     n ≤ size); empty documents emit no chunks.
  *
  * Scale shape: pure codegen — regexp_extract_all + explode(sequence)
  * + slice/array_join column expressions; no UDF, no typed map, no
  * shuffle. Rides the corpus scan; chunk rows stream straight into
  * the embedding/packing stages.
  */
object Chunking {

  /** One row per chunk: (idCol, chunk_idx, token_offset, n_tokens,
    * chunk_text). */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
                    size: Int = 64, overlap: Int = 16): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need 0 <= overlap < size")
    val stride = size - overlap
    df.select(col(idCol), col(textCol).cast("string").as("_t"))
      .withColumn("_toks", expr("regexp_extract_all(_t, '\\\\S+', 0)"))
      .withColumn("_n",
        org.apache.spark.sql.functions.size(col("_toks")).cast("long"))
      .where(col("_n") > 0)
      .withColumn("chunk_idx", explode(expr(
        s"sequence(0L, CASE WHEN _n <= $size THEN 0L " +
          s"ELSE ((_n - $size) + ${stride - 1}) div $stride END)")))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride).as("token_offset"),
        least(lit(size.toLong), col("_n") - col("chunk_idx") * stride)
          .as("n_tokens"),
        expr(s"array_join(slice(_toks, " +
          s"CAST(chunk_idx * $stride + 1 AS INT), $size), ' ')")
          .as("chunk_text"))
  }
}
