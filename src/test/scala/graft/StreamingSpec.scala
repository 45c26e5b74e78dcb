package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.streaming.StreamingExtract

/** Structured-Streaming ingest (SURVEY.md §2.8): new files are picked up
  * incrementally, the streaming checkpoint prevents reprocessing, and the
  * watermarked daily roll-up aggregates event-time windows. */
class StreamingSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("file-source stream extracts a backlog, then only new files on restart") {
    val root = Files.createTempDirectory("graft_stream_").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"

    // batch 1: rows [0, 200)
    CorpusGen.generate(spark, 200, partitions = 2).toDF()
      .write.mode("append").parquet(in)
    val q1 = StreamingExtract.start(spark, in, out, ckpt)
    q1.awaitTermination()
    val n1 = spark.read.parquet(s"$out/data").count()
    assert(n1 == 200)

    // batch 2: 100 more rows land; restart with the same checkpoint —
    // only the new files process (no duplicates)
    spark.range(200, 300, 1, 2).map(CorpusGen.row(_)).toDF()
      .write.mode("append").parquet(in)
    val q2 = StreamingExtract.start(spark, in, out, ckpt)
    q2.awaitTermination()

    val outDf = spark.read.parquet(s"$out/data")
    assert(outDf.count() == 300)
    assert(outDf.select("url").distinct().count() == 300)

    // per-batch lineage rows in the metrics table cover all docs
    val metrics = spark.read.parquet(s"$out/_metrics")
    assert(metrics.agg(sum("docCount")).as[Long].head() == 300)
    assert(metrics.select("batchId").distinct().count() >= 2)

    // extracted text identical to the batch pipeline (same engine)
    val streamed = outDf.select("url", "fullText").as[(String, String)]
      .collect().toMap
    val direct = graft.extract.Pipeline.run(
        CorpusGen.generate(spark, 300, partitions = 4).toDF())
      .select("url", "fullText").as[(String, String)].collect()
    direct.foreach { case (url, text) => assert(streamed(url) == text) }
  }

  test("watermarked daily roll-up over the results stream") {
    val root = Files.createTempDirectory("graft_stream_wm_").toString
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(String, java.sql.Timestamp, Long, String)]
    val day0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val day1 = java.sql.Timestamp.valueOf("2026-01-02 03:00:00")
    mem.addData(
      ("u1", day0, 100L, "ok"), ("u2", day0, 50L, "ok"),
      ("u3", day1, 10L, "error"), ("u4", day1, 30L, "ok"))

    val df = mem.toDF().toDF("url", "warcTs", "sizeBytes", "status")
    val agg = StreamingExtract.dailyStats(df)
    val q = agg.writeStream
      .format("memory").queryName("daily_stats_test")
      .outputMode("complete")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("daily_stats_test")
      .orderBy("day", "status")
      .select(date_format(col("day"), "yyyy-MM-dd").as("d"), col("status"),
        col("n_docs"), col("total_bytes"))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(rows == Seq(
      ("2026-01-01", "ok", 2L, 150L),
      ("2026-01-02", "error", 1L, 10L),
      ("2026-01-02", "ok", 1L, 30L)))
  }
}
