package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-span REMOVAL — the second half of exact substring dedup
  * (Lee et al. 2022 "Deduplicating Training Data Makes Language Models
  * Better"): where `Dedup.duplicateShingles` DISCOVERS repeated
  * n-grams, this stage cuts them out of the documents: every token
  * position covered by any occurrence of a k-gram that appears >=
  * `minCount` times in the corpus is dropped, and the survivors
  * reassemble in original order. (The paper removes 50-token repeats
  * found via suffix arrays; the shingle formulation reaches the same
  * fixed-k contract with only joins and aggregates — no suffix
  * structure to build or shard.)
  *
  * Scale shape: shingles derive from the token array with pure array
  * expressions (transform/slice — codegen, no per-doc window sort);
  * with `hashed=true` (the 100 TB path) the global duplicate set and
  * the coverage join shuffle 64-bit xxhash64 fingerprints, never
  * shingle text; coverage collapses to distinct (doc, pos) pairs; the
  * only text that moves is each doc's own token list coming back
  * together in the final per-doc aggregate. `hashed=false` keeps
  * shingle strings for the byte-exact oracle twin.
  *
  * Determinism: reassembly sorts the collected (pos, token) structs —
  * partitioning-independent; all counts are integers.
  */
object SpanRemoval {

  /** Returns (doc_id, n_tokens, n_removed, cleaned). Tokens are the
    * whitespace-split sequence (empties preserved — positions must
    * mirror the source text exactly). */
  def removeDuplicateSpans(docs: DataFrame, idCol: String,
                           textCol: String, k: Int = 3,
                           minCount: Long = 2L,
                           hashed: Boolean = true): DataFrame = {
    require(k >= 1, "k >= 1")
    require(minCount >= 2L, "minCount >= 2 (1 would remove everything)")
    val d = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ", -1).as("arr"))
      .withColumn("n_tokens", size(col("arr")).cast("long"))
    val shingleList = expr(
      s"transform(sequence(0, size(arr) - $k), " +
        s"i -> array_join(slice(arr, i + 1, $k), ' '))")
    val sh0 = d.where(size(col("arr")) >= k)
      .select(col("doc_id"), posexplode(shingleList).as(Seq("p", "sh")))
    val sh =
      if (hashed) sh0.select(col("doc_id"), col("p"),
        xxhash64(col("sh")).as("key"))
      else sh0.withColumnRenamed("sh", "key")
    val dup = sh.groupBy(col("key"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
      .select(col("key"))
    val covered = sh.join(dup, "key")
      .select(col("doc_id"),
        explode(expr(s"sequence(p, p + ${k - 1})")).as("pos"))
      .distinct()
    val toks = d.select(col("doc_id"),
      posexplode(col("arr")).as(Seq("pos", "tok")))
    val keptAgg = toks
      .join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(pos, tok))), " +
            "x -> x.tok)")).as("cleaned"))
    d.select(col("doc_id"), col("n_tokens"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }
}
