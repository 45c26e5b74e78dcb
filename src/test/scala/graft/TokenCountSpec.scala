package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TokenCount

/** BPE pre-tokenizer token counting: pinned counts for the
  * `token_budget` oracle. */
class TokenCountSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def counts(text: String): (Long, Long) = {
    val r = TokenCount.withTokenCounts(
        Seq((1L, text)).toDF("doc_id", "text"), "text")
      .select("bpe_tokens", "ws_tokens").as[(Long, Long)].head()
    r
  }

  test("plain prose: one unit per word, leading spaces absorbed") {
    assert(counts("the quick brown fox") == ((4L, 4L)))
  }

  test("contractions split off the suffix") {
    // "don't" -> " don" is wrong: tokens are ['don', ''t'] for the
    // first word then ' can', ''t' -> 4 bpe units, 2 ws words
    assert(counts("don't can't") == ((4L, 2L)))
  }

  test("digits and punctuation form separate runs") {
    // ['version', ' 2', '.', '0', ' ships', '!!'] = 6
    assert(counts("version 2.0 ships!!") == ((6L, 3L)))
  }

  test("whitespace runs are never counted") {
    assert(counts("a   b\t\tc\n") == ((3L, 3L)))
    assert(counts("   ") == ((0L, 0L)))
  }

  test("mixed alnum splits into letter and digit runs") {
    // 'x86' -> ['x', '86'] ; ' arch' -> 1
    assert(counts("x86 arch") == ((3L, 2L)))
  }

  test("tokenBudget rolls up exact sums per group") {
    val df = Seq(
      (1L, "aa bb", "en"), (2L, "cc dd ee", "en"), (3L, "ff", "de")
    ).toDF("doc_id", "text", "lang")
    val r = TokenCount.tokenBudget(df, "text", "lang")
      .select("lang", "n_docs", "bpe_tokens", "ws_tokens", "sum_chars",
        "bpe_per_kchar")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    assert(r("en") == ((2L, 5L, 5L, 13L, (5L * 1000) / 13L)))
    assert(r("de") == ((1L, 1L, 1L, 2L, 500L)))
  }
}
