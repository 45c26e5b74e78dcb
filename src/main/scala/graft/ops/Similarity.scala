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

  /** Sign-of-dot-product bucket keys for one embedding across all hash
    * tables — the single implementation behind both lshTopK and
    * cosineDupPairs. */
  private def signBuckets(planes: Seq[Array[Array[Float]]],
      emb: Seq[Float]): Seq[(Int, Int)] = {
    planes.indices.map { t =>
      var key = 0
      var p = 0
      while (p < planes(t).length) {
        var dot = 0.0; var i = 0
        val plane = planes(t)(p)
        while (i < emb.length && i < plane.length) { dot += emb(i) * plane(i); i += 1 }
        if (dot >= 0) key |= (1 << p)
        p += 1
      }
      (t, key)
    }
  }

  /** Embedding-cosine near-duplicate pairs: random-hyperplane LSH buckets
    * generate candidates (vectors agreeing on all nPlanes signs in ≥1 of
    * `tables` tables), exact cosine verifies. The self-join runs on
    * (table, bucketKey) — never the full N² cross product; near-identical
    * vectors collide with probability ≈ (1 − θ/π)^nPlanes per table. */
  def cosineDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
      nPlanes: Int = 12, tables: Int = 4, dim: Int = 64,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    val planes = (0 until tables).map(t => hyperplanes(nPlanes, dim, 42L + t))
    val bPlanes = spark.sparkContext.broadcast(planes)
    val bucketUdf = udf { (emb: Seq[Float]) => signBuckets(bPlanes.value, emb) }
    val bucketed = embeddings
      .select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("bucket", explode(bucketUdf(col("emb"))))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("emb").as("emb_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("emb").as("emb_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosineExpr("emb_a", "emb_b"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  // ------------------------------------------------------------------ IVF

  /** Deterministic k-means coarse quantizer trained on a driver-side
    * sample (seeded init from evenly-spaced sample points, `iters`
    * Lloyd rounds). Sample size stays driver-small; at 100 TB the
    * sample is a `TABLESAMPLE`-style fraction, not the corpus. */
  def trainCentroids(sample: Array[Array[Float]], k: Int, iters: Int = 5)
      : Array[Array[Float]] = {
    require(sample.nonEmpty, "empty centroid training sample")
    val dim = sample.head.length
    // evenly-spaced deterministic init (sample order is caller-fixed)
    var centroids = Array.tabulate(math.min(k, sample.length)) { j =>
      sample((j.toLong * sample.length / math.min(k, sample.length)).toInt).clone()
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }.toArray
      it += 1
    }
    centroids
  }

  def nearestCentroid(v: Seq[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0; var i = 0
      val cent = centroids(c)
      while (i < cent.length && i < v.length) {
        val diff = v(i) - cent(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def nearestCentroids(v: Seq[Float], centroids: Array[Array[Float]],
      nProbe: Int): Seq[Int] = {
    centroids.indices.map { c =>
      var d = 0.0; var i = 0
      val cent = centroids(c)
      while (i < cent.length && i < v.length) {
        val diff = v(i) - cent(i); d += diff * diff; i += 1
      }
      (c, d)
    }.sortBy(_._2).take(nProbe).map(_._1)
  }

  /** IVF-flat ANN: corpus vectors are assigned to their nearest coarse
    * centroid (one narrow projection — at scale this is the partition /
    * clustering key of the stored index); each query probes its `nProbe`
    * closest centroids and re-ranks exactly within those inverted lists.
    * Recall improves with nProbe; nProbe = nCentroids degrades to brute
    * force. Centroids train on `sampleSize` rows ordered by id
    * (deterministic). */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, sampleSize: Int = 2048,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    val sample = embeddings
      .select(col(idCol).as("id"), col(embCol).as("emb"))
      .orderBy(col("id")).limit(sampleSize)
      .collect().map(_.getSeq[Float](1).toArray)
    val centroids = trainCentroids(sample, nCentroids)
    val bCent = spark.sparkContext.broadcast(centroids)

    val assignUdf = udf { (emb: Seq[Float]) => nearestCentroid(emb, bCent.value) }
    val probeUdf = udf { (emb: Seq[Float]) =>
      nearestCentroids(emb, bCent.value, nProbe)
    }

    val corpus = embeddings
      .select(col(idCol).as("neighbor_id"), col(embCol).as("emb_n"))
      .withColumn("centroid", assignUdf(col("emb_n")))
    val qs = queries
      .select(col(idCol).as("query_id"), col(embCol).as("emb_q"))
      .withColumn("centroid", explode(probeUdf(col("emb_q"))))

    val cands = corpus.join(broadcast(qs), Seq("centroid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosineExpr("emb_q", "emb_n"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
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
    def bucketUdf = udf { (emb: Seq[Float]) => signBuckets(bPlanes.value, emb) }

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
