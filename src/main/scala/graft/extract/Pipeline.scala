package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-level wiring of the extraction engine (SURVEY.md §3.4):
  * one narrow typed mapPartitions stage over the pruned input columns —
  * parse + extract + doc analytics fused, no shuffle until the caller
  * aggregates. Skew/size handling per SURVEY.md §4.2:
  *
  *  - `rebalancePartitions > 0` round-robin-repartitions the scan so
  *    pathological mega-documents spread across tasks (salting analog
  *    for a narrow map; keyed salting belongs to the agg stages);
  *  - per-document size budget: payloads over `oversizeBudgetBytes` are
  *    tallied as failures (status = "oversize") without parsing, matching
  *    the reference's per-job failure path (`local_queue.py:359-403`) —
  *    budgets never truncate the text of in-budget docs (§7.3).
  */
object Pipeline {

  /** Input row per BASELINE.json input_hint — `text` intentionally absent
    * so Catalyst prunes it out of the parquet scan. */
  final case class InputRow(url: String, warc_ts: java.sql.Timestamp,
      html: Array[Byte], lang: String)

  val DefaultOversizeBudget: Long = 256L * 1024 * 1024

  def run(input: DataFrame,
      oversizeBudgetBytes: Long = DefaultOversizeBudget,
      rebalancePartitions: Int = 0): Dataset[DocResult] = {
    val spark = input.sparkSession
    import spark.implicits._
    val pruned = input.select(col("url"), col("warc_ts"), col("html"), col("lang"))
    val balanced =
      if (rebalancePartitions > 0) pruned.repartition(rebalancePartitions)
      else pruned
    balanced.as[InputRow].mapPartitions { rows =>
      rows.map { r =>
        val size = if (r.html == null) 0L else r.html.length.toLong
        if (size > oversizeBudgetBytes)
          DocResult(r.url, r.warc_ts, r.lang, "unknown", "", size,
            "oversize", s"payload $size bytes exceeds budget $oversizeBudgetBytes",
            "", 0, "", Nil, Nil, "unsigned", "other", Nil, Nil, Nil, Nil,
            "", "", Nil, "unknown", "unknown", 0L, 0L, 0.0, "uncertain",
            "poor", "ocr", "2.1")
        else Extractor.extract(r.url, r.warc_ts, r.html, r.lang)
      }
    }
  }

  /** Projection of the per-url byte-identity contract (url, extracted
    * text, spans) — the minimal output table; column pruning reaches the
    * scan because DocResult is nested-struct typed. */
  def contractView(results: Dataset[DocResult]): DataFrame = {
    results.select(
      col("url"), col("status"), col("fullText").as("text"),
      expr("flatten(transform(pages, p -> transform(p.blocks, b -> " +
        "struct(b.start, b.end, b.blockType as block_type, p.pageNumber as page))))")
        .as("spans"))
  }
}
