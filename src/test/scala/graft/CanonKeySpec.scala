package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CanonKey

/** Canonical-dedup-key semantics pinned for the `canon_text_key`
  * oracle. */
class CanonKeySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def key(text: String): (String, String) = {
    import spark.implicits._
    CanonKey.withCanonKey(Seq(text).toDF("text"), "text")
      .select("canon_key", "canon_digest")
      .as[(String, String)].collect().head
  }

  test("case, punctuation, and whitespace runs normalize away") {
    assert(key("The  QUICK,,, brown--fox! ")._1 == "the quick brown fox")
    assert(key("  spaces\tand\nnewlines  7 ")._1 == "spaces and newlines 7")
  }

  test("composed and decomposed spellings share one key and digest") {
    val composed = key("Café CRÈME")       // é precomposed
    val decomposed = key("Café CRÈME")    // e + combining acute
    assert(composed == decomposed)
    assert(composed._1 == "café crème")
  }

  test("digits survive; only letter/digit runs remain") {
    assert(key("v2.0-beta (build #42)")._1 == "v2 0 beta build 42")
  }

  test("digest is the md5 of the key") {
    val (k, d) = key("abc")
    assert(k == "abc")
    assert(d == "900150983cd24fb0d6963f7d28e17f72")
  }
}
