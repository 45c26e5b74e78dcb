package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SpanRemoval

/** Duplicate-span removal: pinned coverage/reassembly semantics for
  * the `span_removal` oracle. */
class SpanRemovalSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e"),          // shares "b c d" with doc 2
    (2L, "x b c d y"),
    (3L, "z z z z"),            // within-doc repeat: "z z z" twice
    (4L, "unique words only here")
  ).toDF("doc_id", "text")

  private def run(hashed: Boolean): Map[Long, (Long, Long, String)] =
    SpanRemoval.removeDuplicateSpans(docs, "doc_id", "text",
        hashed = hashed)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("cross-doc duplicated 3-grams cut from every occurrence") {
    val r = run(hashed = false)
    assert(r(1L) == ((5L, 3L, "a e")))
    assert(r(2L) == ((5L, 3L, "x y")))
  }

  test("within-doc repeats count toward the threshold; full wipe ok") {
    assert(run(hashed = false)(3L) == ((4L, 4L, "")))
  }

  test("docs with no duplicated spans pass through byte-identical") {
    assert(run(hashed = false)(4L) ==
      ((4L, 0L, "unique words only here")))
  }

  test("hashed (64-bit fingerprint) path agrees with the string path") {
    assert(run(hashed = true) == run(hashed = false))
  }

  test("overlapping duplicate occurrences merge their coverage") {
    // "p q p q p q": shingles "p q p"(0,2) and "q p q"(1,3) all dup ->
    // every position covered
    val d = Seq((1L, "p q p q p q")).toDF("doc_id", "text")
    val r = SpanRemoval.removeDuplicateSpans(d, "doc_id", "text",
        hashed = false)
      .as[(Long, Long, Long, String)].collect().head
    assert(r == ((1L, 6L, 6L, "")))
  }

  test("reassembly is partitioning-invariant") {
    val a = SpanRemoval.removeDuplicateSpans(docs.repartition(7),
        "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().toSet
    val b = SpanRemoval.removeDuplicateSpans(docs.coalesce(1),
        "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(a == b)
  }
}
