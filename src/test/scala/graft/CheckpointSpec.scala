package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.extract.Pipeline
import graft.ops.Checkpoint

/** Resume-from-checkpoint semantics (SURVEY.md §5.5, north rule):
  * partial failure → re-run recomputes only the missing partitions and
  * the final table is identical to a single full run; per-partition
  * lineage rows land in the metrics table. */
class CheckpointSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_ckpt_").toString

  private val N = 300L
  private val Buckets = 8

  test("full run commits every bucket with lineage totals that add up") {
    val out = freshDir()
    val corpus = CorpusGen.generate(spark, N, partitions = 8).toDF()
    val report = Checkpoint.runResumable(corpus, out, Buckets, runId = "r1")

    assert(report.skippedBuckets == 0)
    assert(report.processedBuckets == Buckets)
    assert(report.lineage.map(_.docCount).sum == N)

    val m = Checkpoint.metrics(spark, out)
    assert(m.count() == Buckets)
    assert(m.agg(sum("docCount")).as[Long].head() == N)

    // failure tally: corrupt rows (idx%100 in {89, 96}) parse to
    // error/empty without poisoning the run
    val byStatus = Checkpoint.output(spark, out)
      .groupBy("status").count().as[(String, Long)].collect().toMap
    assert(byStatus.getOrElse("ok", 0L) > 0.8 * N)
    assert(byStatus.values.sum == N)
  }

  test("second run over a complete output is a no-op") {
    val out = freshDir()
    val corpus = CorpusGen.generate(spark, N, partitions = 8).toDF()
    Checkpoint.runResumable(corpus, out, Buckets, runId = "r1")
    val again = Checkpoint.runResumable(corpus, out, Buckets, runId = "r2")
    assert(again.skippedBuckets == Buckets)
    assert(again.processedBuckets == 0)
    // no extra metrics rows appended
    assert(Checkpoint.metrics(spark, out).count() == Buckets)
  }

  test("resume recomputes only invalidated buckets; final output byte-identical to a full run") {
    val out = freshDir()
    val corpus = CorpusGen.generate(spark, N, partitions = 8).toDF()
    Checkpoint.runResumable(corpus, out, Buckets, runId = "r1")

    val lost = Seq(1, 4, 6)
    lost.foreach(Checkpoint.invalidateBucket(out, _))

    val resumed = Checkpoint.runResumable(corpus, out, Buckets, runId = "r2")
    assert(resumed.skippedBuckets == Buckets - lost.size)
    assert(resumed.processedBuckets == lost.size)
    assert(resumed.lineage.map(_.bucket).toSet == lost.toSet)

    // lineage: r2 rows exist only for the recomputed buckets
    val r2Buckets = Checkpoint.metrics(spark, out)
      .filter(col("runId") === "r2").select("bucket").as[Int].collect().toSet
    assert(r2Buckets == lost.toSet)

    // final table == direct single-pass extraction, per url
    val direct = Pipeline.run(corpus)
      .select(col("url"), col("fullText"), col("status"), col("sha256"))
      .as[(String, String, String, String)].collect().sortBy(_._1)
    val resumedOut = Checkpoint.output(spark, out)
      .select(col("url"), col("fullText"), col("status"), col("sha256"))
      .as[(String, String, String, String)].collect().sortBy(_._1)
    assert(resumedOut.length == direct.length)
    resumedOut.zip(direct).foreach { case (a, b) => assert(a == b) }
  }

  test("mid-write crash analog: data present but uncommitted bucket is recomputed idempotently") {
    val out = freshDir()
    val corpus = CorpusGen.generate(spark, N, partitions = 8).toDF()
    Checkpoint.runResumable(corpus, out, Buckets, runId = "r1")
    // simulate: manifest for bucket 2 lost AFTER data write (crash between
    // data commit and manifest commit) — the bucket must be overwritten
    // in place without duplicating rows
    Checkpoint.invalidateBucket(out, 2)
    Checkpoint.runResumable(corpus, out, Buckets, runId = "r2")
    val n = Checkpoint.output(spark, out).count()
    assert(n == N, s"dynamic overwrite must not duplicate rows, got $n")
  }
}
