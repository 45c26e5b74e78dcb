package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Pii, Splits}

/** PII redaction (regex scrub + audit counts) and deterministic
  * splitting/stratified sampling: pinned semantics for the contract the
  * `pii_redact` / `split_assign` / `stratified_sample` /
  * `curation_funnel` oracles certify at scale. */
class PiiSplitsSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def redactOne(s: String): (Long, Long, Long, String) = {
    val r = Pii.withPiiRedacted(Seq(s).toDF("t"), "t")
      .select("n_emails", "n_phones", "n_ipv4", "redacted")
      .as[(Long, Long, Long, String)].collect()
    r.head
  }

  test("each PII class is redacted to its typed token and counted") {
    assert(redactOne("mail a.b+c@sub.host.org now") ==
      ((1L, 0L, 0L, "mail <EMAIL> now")))
    assert(redactOne("call +1-555-123-4567 today") ==
      ((0L, 1L, 0L, "call <PHONE> today")))
    assert(redactOne("from 192.168.0.1 port 80") ==
      ((0L, 0L, 1L, "from <IP> port 80")))
  }

  test("numeric-host address is not an email; its IP is still scrubbed") {
    // the email shape requires an alphabetic TLD, so admin@10.0.0.1 is
    // NOT an email — but the dotted quad must not leak either: the IPv4
    // pass catches it (counts are per-pattern over the original text)
    val (e, p, i, red) = redactOne("x admin@10.0.0.1 y")
    assert((e, p, i) == ((0L, 0L, 1L)))
    assert(red == "x admin@<IP> y")
  }

  test("multiple occurrences all redacted; clean text untouched") {
    val (e, _, _, red) = redactOne("a@b.org then c@d.io end")
    assert(e == 2L && red == "<EMAIL> then <EMAIL> end")
    assert(redactOne("no pii here, just words.") ==
      ((0L, 0L, 0L, "no pii here, just words.")))
  }

  test("hashBucket is md5-derived, in [0,256), and engine-stable") {
    val rows = spark.range(0, 512)
      .withColumn("b", Splits.hashBucket(col("id")))
      .select("id", "b").as[(Long, Int)].collect()
    assert(rows.forall { case (_, b) => b >= 0 && b < 256 })
    // pinned value: md5("42") = a1d0c6e8... -> 0xa1 = 161 (cross-checked
    // against DuckDB md5 in the split_assign oracle)
    assert(rows.find(_._1 == 42L).get._2 == 161)
  }

  test("split assignment is deterministic and near the 81/9/9 design") {
    val df = Splits.withSplit(spark.range(0, 2000).toDF("doc_id"), "doc_id")
    val counts = df.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    val frac = counts("train").toDouble / 2000
    assert(frac > 0.77 && frac < 0.86, s"train frac $frac")
    // stable across repartitionings (the decision is key-pure)
    val again = Splits.withSplit(
      spark.range(0, 2000).toDF("doc_id").repartition(7), "doc_id")
    assert(again.orderBy("doc_id").as[(Long, Int, String)].collect().toSeq ==
      df.orderBy("doc_id").as[(Long, Int, String)].collect().toSeq)
  }

  test("stratifiedKeep rate tracks the threshold and is salt-decorrelated") {
    val n = 4096L
    val kept = spark.range(0, n)
      .filter(Splits.stratifiedKeep(col("id"), lit(64)))
      .count()
    val rate = kept.toDouble / n
    assert(rate > 0.20 && rate < 0.30, s"keep rate $rate at 64/256")
    // decorrelated from split assignment: kept rows contain all splits
    val splits = Splits.withSplit(spark.range(0, n).toDF("doc_id"), "doc_id")
      .filter(Splits.stratifiedKeep(col("doc_id"), lit(64)))
      .select("split").distinct().as[String].collect().toSet
    assert(splits == Set("train", "val", "test"))
  }
}
