package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Chunking

/** Sliding-window chunk semantics pinned for the `passage_chunks`
  * oracle. */
class ChunkingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def chunks(text: String, size: Int, overlap: Int) = {
    import spark.implicits._
    Chunking.slidingChunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, overlap)
      .select("chunk_idx", "token_offset", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
  }

  test("exact windows, overlap carried, truncated tail") {
    // 7 tokens, size 4, overlap 2 -> stride 2; last = ceil(3/2) = 2
    val got = chunks("a b c d e f g", 4, 2)
    assert(got == Seq(
      (0L, 0L, 4L, "a b c d"),
      (1L, 2L, 4L, "c d e f"),
      (2L, 4L, 3L, "e f g")))
  }

  test("short document: exactly one chunk, no contained trailer") {
    assert(chunks("a b c", 4, 2) == Seq((0L, 0L, 3L, "a b c")))
    // n == size: one chunk only
    assert(chunks("a b c d", 4, 2) == Seq((0L, 0L, 4L, "a b c d")))
  }

  test("exact multiple: the final window reaches the last token once") {
    // 6 tokens, size 4, stride 2 -> last = ceil(2/2) = 1
    assert(chunks("a b c d e f", 4, 2) == Seq(
      (0L, 0L, 4L, "a b c d"),
      (1L, 2L, 4L, "c d e f")))
  }

  test("whitespace runs collapse; empty text emits nothing") {
    assert(chunks("  a\n\n b\tc  ", 2, 0) ==
      Seq((0L, 0L, 2L, "a b"), (1L, 2L, 1L, "c")))
    assert(chunks("", 4, 2).isEmpty)
    assert(chunks("   ", 4, 2).isEmpty)
  }

  test("zero overlap tiles exactly") {
    val got = chunks("a b c d e", 2, 0)
    assert(got.map(_._4) == Seq("a b", "c d", "e"))
    assert(got.map(_._2) == Seq(0L, 2L, 4L))
  }
}
