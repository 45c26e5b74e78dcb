package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry point — the Spark re-expression of the reference's
  * CLI lifecycle (`idp_pipeline/run.py` submit/process/status,
  * SURVEY.md §3.1). One binary, subcommands:
  *
  *   extract   --in DIR --out DIR [--buckets N] [--run-id ID]
  *             resumable checkpointed batch extraction (Checkpoint);
  *             re-running with the same --out resumes past committed
  *             buckets — the submit+process+retry loop in one idempotent
  *             command
  *   stream    --in DIR --out DIR --checkpoint DIR [--continuous]
  *             Structured-Streaming drain of a landing zone
  *   status    --out DIR
  *             lineage roll-up of a previous run (the reference's
  *             `run.py status` / queue stats analog)
  *   json      --out DIR --dest DIR
  *             materialize the v2.1 enhanced JSON view of a completed run
  *   gen       --out DIR --docs N
  *             write a synthesized corpus (testing/bench)
  *
  * On a cluster: `spark-submit --class graft.Cli app.jar extract ...`
  * (master from spark-submit); locally defaults to local[*]. */
object Cli {

  private def arg(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(s"--$name")
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  private def session(): SparkSession = {
    val b = SparkSession.builder().appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit passes --master as the spark.master system property;
    // only default to local[*] when no master was provided at all
    val masterProvided =
      sys.props.contains("spark.master") || sys.env.contains("SPARK_MASTER")
    val s = (if (masterProvided) b
             else b.master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]")))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val cmd = args.head
    val rest = args.tail
    val spark = session()
    try cmd match {
      case "extract" =>
        val in = arg(rest, "in").getOrElse(fail("--in required"))
        val out = arg(rest, "out").getOrElse(fail("--out required"))
        val buckets = arg(rest, "buckets").map(_.toInt).getOrElse(64)
        val runId = arg(rest, "run-id").getOrElse(s"run-${java.util.UUID.randomUUID}")
        val report = ops.Checkpoint.runResumable(
          spark.read.parquet(in), out, buckets, runId)
        println(s"run=$runId buckets=${report.nBuckets} " +
          s"skipped=${report.skippedBuckets} processed=${report.processedBuckets} " +
          s"docs=${report.lineage.map(_.docCount).sum} " +
          s"failed=${report.lineage.map(_.failCount).sum}")

      case "stream" =>
        val in = arg(rest, "in").getOrElse(fail("--in required"))
        val out = arg(rest, "out").getOrElse(fail("--out required"))
        val ckpt = arg(rest, "checkpoint").getOrElse(fail("--checkpoint required"))
        val continuous = rest.contains("--continuous")
        val q = streaming.StreamingExtract.start(spark, in, out, ckpt,
          availableNow = !continuous)
        q.awaitTermination()

      case "status" =>
        val out = arg(rest, "out").getOrElse(fail("--out required"))
        ops.Checkpoint.metrics(spark, out)
          .groupBy(col("runId"))
          .agg(count(lit(1)).as("buckets"), sum("docCount").as("docs"),
            sum("okCount").as("ok"), sum("failCount").as("failed"),
            sum("emptyCount").as("empty"), sum("inputBytes").as("bytes"))
          .orderBy(col("runId"))
          .show(100, truncate = false)

      case "json" =>
        val out = arg(rest, "out").getOrElse(fail("--out required"))
        val dest = arg(rest, "dest").getOrElse(fail("--dest required"))
        import spark.implicits._
        val results = ops.Checkpoint.output(spark, out)
          .drop("bucket").as[graft.extract.DocResult]
        graft.extract.Pipeline.enhancedJsonView(results)
          .write.mode("overwrite").parquet(dest)
        println(s"wrote enhanced JSON to $dest")

      case "gen" =>
        val out = arg(rest, "out").getOrElse(fail("--out required"))
        val docs = arg(rest, "docs").map(_.toLong).getOrElse(10000L)
        val parts = arg(rest, "partitions").map(_.toInt).getOrElse(64)
        corpus.CorpusGen.generate(spark, docs, parts)
          .write.mode("overwrite").parquet(out)
        println(s"wrote $docs docs to $out")

      case other =>
        System.err.println(s"unknown command: $other"); usage(); sys.exit(2)
    } finally spark.stop()
  }

  private def fail(msg: String): Nothing = {
    System.err.println(msg); usage(); sys.exit(2)
  }

  private def usage(): Unit = System.err.println(
    """usage: graft.Cli <command> [options]
      |  extract --in DIR --out DIR [--buckets N] [--run-id ID]
      |  stream  --in DIR --out DIR --checkpoint DIR [--continuous]
      |  status  --out DIR
      |  json    --out DIR --dest DIR
      |  gen     --out DIR --docs N [--partitions N]""".stripMargin)
}
