package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** BPE merge-candidate semantics pinned for the `bpe_candidates`
  * oracle. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def pairs(docs: Seq[String], k: Int = 25) = {
    import spark.implicits._
    Bpe.mergeCandidates(docs.toDF("text"), "text", k)
      .as[(String, String, Long)].collect().toSeq
  }

  test("hand-computed pair counts, word-frequency weighted") {
    // vocab: aa x2, ab x1. pairs: aa -> (a,a)+(a,</w>) each x2;
    // ab -> (a,b)+(b,</w>) each x1
    val got = pairs(Seq("aa AA ab"))
    assert(got.toSet == Set(("a", "</w>", 2L), ("a", "a", 2L),
      ("a", "b", 1L), ("b", "</w>", 1L)))
    // ordering: count desc, then sym1, sym2 ('<' sorts before 'a')
    assert(got == Seq(("a", "</w>", 2L), ("a", "a", 2L),
      ("a", "b", 1L), ("b", "</w>", 1L)))
  }

  test("single-char words contribute only their end-of-word pair") {
    assert(pairs(Seq("x x x")) == Seq(("x", "</w>", 3L)))
  }

  test("non-letters split words; k truncates deterministically") {
    val got = pairs(Seq("to-to to2to"), k = 2)
    // words: to x4 (both '-' and '2' split) -> (t,o) 4, (o,</w>) 4
    assert(got == Seq(("o", "</w>", 4L), ("t", "o", 4L)))
  }

  test("partitioning invariance") {
    import spark.implicits._
    val docs = (0 until 40).map(i => s"alpha beta gamma doc $i")
    val a = Bpe.mergeCandidates(docs.toDF("text"), "text").collect().toSeq
    val b = Bpe.mergeCandidates(docs.toDF("text").repartition(7),
      "text").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
