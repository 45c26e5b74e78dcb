package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.Pipeline

/** Resumable snapshot-checkpointed extraction (north rule; SURVEY.md §7.1.7,
  * §4.2): the offline stand-in for an Iceberg table commit. The output is
  * partitioned Parquet keyed by `bucket = pmod(hash(url), nBuckets)` plus a
  * manifest directory holding ONE JSON file per completed bucket, written
  * atomically (temp file + ATOMIC_MOVE). A re-run lists the manifest,
  * skips completed buckets at the scan (predicate pushdown on the bucket
  * filter), recomputes only the missing ones, and overwrites exactly those
  * partitions (`partitionOverwriteMode=dynamic` — idempotent under task or
  * driver failure, matching Iceberg's replace-partition commit semantics).
  *
  * Per-partition lineage (bucket, doc/ok/fail counts, input bytes,
  * extraction-failure tally, run id, duration) is appended to a metrics
  * table at `outDir/_metrics` — the analog of the reference's append-only
  * events/stats tables (`job_queue/local_queue.py:165-186,222-229`).
  *
  * On a real cluster the manifest directory is the piece a true Iceberg
  * catalog replaces (snapshot commit + manifest pruning); everything else
  * — bucketed layout, dynamic overwrite, lineage append — carries over
  * unchanged. Bucket count scales independently of executor count: at
  * 10^12 docs pick nBuckets so one bucket ≈ a few GB (e.g. 2^17 buckets),
  * keeping recompute-on-resume granular and partition files pruned.
  */
object Checkpoint {

  final case class BucketLineage(
      runId: String, bucket: Int, docCount: Long, okCount: Long,
      failCount: Long, emptyCount: Long, inputBytes: Long, durationMs: Long)

  final case class ResumeReport(
      runId: String, nBuckets: Int, skippedBuckets: Int,
      processedBuckets: Int, lineage: Seq[BucketLineage])

  private def manifestDir(outDir: String): Path = Paths.get(outDir, "_manifest")
  private def dataDir(outDir: String): String = s"$outDir/data"
  private def metricsDir(outDir: String): String = s"$outDir/_metrics"

  /** Buckets already committed in a previous (possibly partial) run. */
  def completedBuckets(outDir: String): Set[Int] = {
    val d = manifestDir(outDir)
    if (!Files.exists(d)) Set.empty
    else {
      val it = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala
          .map(_.getFileName.toString)
          .collect { case s if s.startsWith("bucket-") && s.endsWith(".json") =>
            s.stripPrefix("bucket-").stripSuffix(".json").toInt
          }.toSet
      } finally it.close()
    }
  }

  /** Atomic per-bucket commit: write JSON to a temp name, then rename.
    * A crash between data write and manifest write re-runs the bucket
    * (dynamic overwrite makes that idempotent); a bucket is only ever
    * skipped if its manifest file exists, i.e. its data write completed. */
  private def commitBucket(outDir: String, l: BucketLineage): Unit = {
    val d = manifestDir(outDir)
    Files.createDirectories(d)
    val json =
      s"""{"run_id":"${l.runId}","bucket":${l.bucket},"doc_count":${l.docCount},
         |"ok_count":${l.okCount},"fail_count":${l.failCount},
         |"empty_count":${l.emptyCount},"input_bytes":${l.inputBytes},
         |"duration_ms":${l.durationMs}}""".stripMargin.replace("\n", "")
    val tmp = d.resolve(s".bucket-${l.bucket}.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, d.resolve(f"bucket-${l.bucket}%05d.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Run extraction over `input` (input_hint schema), resuming past any
    * previously committed buckets. Returns what was skipped vs processed
    * plus the per-bucket lineage appended to the metrics table. */
  def runResumable(input: DataFrame, outDir: String, nBuckets: Int,
      runId: String,
      oversizeBudgetBytes: Long = Pipeline.DefaultOversizeBudget): ResumeReport = {
    val spark = input.sparkSession
    import spark.implicits._
    val t0 = System.nanoTime()

    val done = completedBuckets(outDir)
    val bucketCol = pmod(hash(col("url")), lit(nBuckets))
    val todo = input
      .withColumn("bucket", bucketCol)
      .filter(if (done.isEmpty) lit(true) else !col("bucket").isin(done.toSeq: _*))

    if (todo.isEmpty) {
      return ResumeReport(runId, nBuckets, done.size, 0, Nil)
    }

    val results = Pipeline.run(todo, oversizeBudgetBytes)
      .withColumn("bucket", bucketCol)

    // Replace exactly the recomputed partitions; completed ones untouched.
    val overwriteKey = "spark.sql.sources.partitionOverwriteMode"
    val prevMode = spark.conf.getOption(overwriteKey)
    spark.conf.set(overwriteKey, "dynamic")
    try {
      results.write.mode("overwrite").partitionBy("bucket").parquet(dataDir(outDir))
    } finally {
      // restore OR unset — leaving dynamic set would silently change the
      // semantics of later whole-table overwrites in this session
      prevMode match {
        case Some(v) => spark.conf.set(overwriteKey, v)
        case None => spark.conf.unset(overwriteKey)
      }
    }

    // Lineage from the data as written (read-back → what a reader will see;
    // partition pruning keeps this to the recomputed buckets only).
    val durationMs = (System.nanoTime() - t0) / 1000000L
    val todoBuckets = (0 until nBuckets).filterNot(done)
    val lineage = spark.read.parquet(dataDir(outDir))
      .filter(col("bucket").isin(todoBuckets: _*))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("docCount"),
        sum(when(col("status") === "ok", 1L).otherwise(0L)).as("okCount"),
        sum(when(col("status") === "error" || col("status") === "oversize" ||
            col("status") === "unsupported", 1L)
          .otherwise(0L)).as("failCount"),
        sum(when(col("status") === "empty", 1L).otherwise(0L)).as("emptyCount"),
        sum(col("sizeBytes")).as("inputBytes"))
      .collect()
      .map { r =>
        BucketLineage(runId, r.getAs[Int]("bucket"), r.getAs[Long]("docCount"),
          r.getAs[Long]("okCount"), r.getAs[Long]("failCount"),
          r.getAs[Long]("emptyCount"), r.getAs[Long]("inputBytes"), durationMs)
      }.toSeq.sortBy(_.bucket)

    // Append lineage to the metrics table, then commit manifests last —
    // a bucket counts as done only after data + metrics are durable.
    if (lineage.nonEmpty) {
      lineage.toDF().write.mode("append").parquet(metricsDir(outDir))
      lineage.foreach(commitBucket(outDir, _))
    }

    ResumeReport(runId, nBuckets, done.size, lineage.size, lineage)
  }

  /** The per-partition lineage/metrics table (append-only across runs). */
  def metrics(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(metricsDir(outDir))

  /** The committed output table. */
  def output(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(dataDir(outDir))

  /** Drop a bucket's commit so the next run recomputes it (used by tests
    * and by operational backfills — the Iceberg-rollback analog). */
  def invalidateBucket(outDir: String, bucket: Int): Unit = {
    Files.deleteIfExists(manifestDir(outDir).resolve(f"bucket-$bucket%05d.json"))
  }
}
