package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]) — brute-force cosine top-k as the correctness baseline,
  * and a random-hyperplane LSH-bucketed variant as the 100 TB scale path
  * (bucket-join instead of full cross product).
  *
  * All math uses built-in higher-order functions (zip_with / aggregate),
  * staying inside Catalyst codegen — no UDFs. */
object Similarity {

  /** cosine(a, b) as a Column expression over two array<float> columns. */
  def cosineExpr(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))
       |    * sqrt(aggregate($b, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double))))""".stripMargin.replace("\n", " "))

  /** Brute-force cosine top-k for the query rows against the full set.
    * Queries are broadcast (small side); the big side streams — one pass,
    * no shuffle of the corpus. Output: (query_id, neighbor_id, cos, rank). */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val corpus = embeddings.select(col(idCol).as("neighbor_id"), col(embCol).as("emb_n"))
    val qs = queries.select(col(idCol).as("query_id"), col(embCol).as("emb_q"))
    val scored = corpus.join(broadcast(qs), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineExpr("emb_q", "emb_n"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Deterministic random hyperplanes: nPlanes x dim sign matrix. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    val r = new java.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(if (r.nextBoolean()) 1.0f else -1.0f))
  }

  /** LSH-bucketed ANN: sign-of-dot-product per hyperplane → bucket key;
    * candidates share a bucket in at least one of `tables` independent
    * tables; exact cosine re-rank inside buckets. At scale this replaces
    * the O(N·Q) cross product with a bucket-join whose fan-in is bounded
    * by bucket occupancy. */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 12, tables: Int = 4, dim: Int = 64,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    val planes = (0 until tables).map(t => hyperplanes(nPlanes, dim, 42L + t))
    val bPlanes = spark.sparkContext.broadcast(planes)

    def bucketUdf = udf { (emb: Seq[Float]) =>
      val ps = bPlanes.value
      ps.indices.map { t =>
        var key = 0
        var p = 0
        while (p < ps(t).length) {
          var dot = 0.0
          var i = 0
          val plane = ps(t)(p)
          while (i < emb.length && i < plane.length) { dot += emb(i) * plane(i); i += 1 }
          if (dot >= 0) key |= (1 << p)
          p += 1
        }
        (t, key)
      }
    }

    val corpus = embeddings
      .select(col(idCol).as("neighbor_id"), col(embCol).as("emb_n"))
      .withColumn("bucket", explode(bucketUdf(col("emb_n"))))
    val qs = queries
      .select(col(idCol).as("query_id"), col(embCol).as("emb_q"))
      .withColumn("bucket", explode(bucketUdf(col("emb_q"))))

    val cands = corpus.join(broadcast(qs), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosineExpr("emb_q", "emb_n"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }
}
