package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen

/** Physical-layout scale evidence (SURVEY.md §4.2): bucketed tables
  * co-locate join keys so repeated large-table joins skip the shuffle
  * entirely, and day-partitioned layouts prune the scan to the filtered
  * partitions — the two storage-level levers the 100 TB design leans on
  * (Iceberg partition/sort-order equivalents on a real cluster). */
class BucketingSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    val p = df.queryExecution.executedPlan
    p.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }.getOrElse(p)
  }

  test("bucketed tables join without any shuffle exchange") {
    // drop stale tables AND their managed locations from earlier runs
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete(): Unit
    }
    Seq("b_docs", "b_scores").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:") + s"/$t"
      deleteRec(new java.io.File(loc))
    }
    val docs = spark.range(0, 2000).select(col("id").as("doc_id"),
      (col("id") % 97).as("feature"))
    val scores = spark.range(0, 2000).select(col("id").as("doc_id"),
      (col("id") % 13).cast("double").as("score"))
    docs.write.mode("overwrite").bucketBy(8, "doc_id")
      .sortBy("doc_id").saveAsTable("b_docs")
    scores.write.mode("overwrite").bucketBy(8, "doc_id")
      .sortBy("doc_id").saveAsTable("b_scores")
    val joined = spark.sql(
      """SELECT /*+ MERGE(b_scores) */ d.doc_id, d.feature, s.score
        |FROM b_docs d JOIN b_scores s ON d.doc_id = s.doc_id""".stripMargin)
    val plan = finalPlan(joined)
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"bucketed join must not shuffle either side:\n$plan")
    assert(joined.count() == 2000)
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.forall(_.bucketedScan), "both sides must use the bucketed scan")
  }

  test("time-partitioned corpus prunes the scan to the filtered partition") {
    // corpus rows are 37s apart, so 400 rows span ~4 hours — partition
    // by hour (days(warc_ts) is the same mechanism at production scale)
    val root = Files.createTempDirectory("graft_part_").toString
    CorpusGen.generate(spark, 400, partitions = 4).toDF()
      .withColumn("hour", date_format(col("warc_ts"), "yyyy-MM-dd-HH"))
      .write.mode("overwrite").partitionBy("hour").parquet(root)
    val hours = spark.read.parquet(root).select("hour").distinct().count()
    assert(hours > 1, "fixture must span multiple partitions")
    val one = spark.read.parquet(root)
      .filter(col("hour") === "2026-01-01-01").select("url")
    one.collect()
    val plan = one.queryExecution.executedPlan
    val scan = plan.collect { case s: FileSourceScanExec => s }.head
    // partition pruning shows as a partition filter on the scan node +
    // a partition-column schema (the data files never carry `hour`)
    assert(scan.relation.partitionSchema.fieldNames.contains("hour"))
    val pf = scan.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("hour"), s"expected hour partition filter, got ${scan.metadata}")
  }
}
