package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Snapshot

/** Incremental snapshot delta: pinned added/removed/changed/unchanged
  * classification for the `snapshot_delta` oracle. */
class SnapshotSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def snap(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), sha2(col("text"), 256).as("digest"))

  test("all four statuses classify by key presence and digest compare") {
    val old = snap(1L -> "same", 2L -> "before", 3L -> "gone")
    val neu = snap(1L -> "same", 2L -> "after", 4L -> "fresh")
    val out = Snapshot.delta(old, neu, "doc_id", "digest")
      .select("doc_id", "status").as[(Long, String)]
      .collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("deltaStats checksums certify which keys land in each class") {
    val old = snap(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
    val neu = snap(2L -> "b", 3L -> "C!", 4L -> "d", 9L -> "new")
    val stats = Snapshot.deltaStats(old, neu, "doc_id", "digest")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(stats == Map(
      "removed" -> ((1L, 1L)),
      "unchanged" -> ((2L, 6L)),   // keys 2 + 4
      "changed" -> ((1L, 3L)),
      "added" -> ((1L, 9L))))
  }

  test("identical snapshots are all unchanged; empty old is all added") {
    val s = snap(1L -> "x", 2L -> "y")
    assert(Snapshot.delta(s, s, "doc_id", "digest")
      .select("status").distinct().as[String].collect().toSeq == Seq("unchanged"))
    val empty = snap()
    assert(Snapshot.delta(empty, s, "doc_id", "digest")
      .select("status").distinct().as[String].collect().toSeq == Seq("added"))
  }
}
